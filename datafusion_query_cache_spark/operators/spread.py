"""Scan-parallelism guard for small / unsplittable inputs.

A parquet file is splittable only at ROW-GROUP grain: a file written as one
row group is one scan task no matter how small ``maxPartitionBytes`` is or
how many cores the session has. The bench fixtures (and any compacted small
table) are exactly that shape — so every downstream per-row computation
(shingling, hashing, regex, higher-order array folds) serializes onto one
core out of 32. This is the "one huge unsplittable file" input-skew case of
the optimization guide (§2.5): the fix is one cheap round-robin repartition
of the raw rows immediately after the read, which unlocks full-width scan
stages for everything downstream.

At scale this is a NO-OP by construction: any input already carrying at
least ``min_ratio x defaultParallelism`` partitions is returned unchanged,
so a 100 TB table (thousands of splits) never pays the extra exchange. The
check costs one plan analysis (``df.rdd.getNumPartitions()``), no Spark job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: set to "0" to disable everywhere (e.g. to A/B the effect)
_ENV_FLAG = "QC_SPREAD_SMALL_INPUTS"


def spread_input(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default parallelism
    when its scan would otherwise run on fewer than
    ``min_ratio * defaultParallelism`` tasks.

    Row-preserving and deterministic under retries (Spark's
    ``sortBeforeRepartition`` applies); per-row ORDER within a partition is
    the source order of that row's slice, and every operator this guards is
    either per-row or a grouped aggregation, so results are unchanged.
    Streaming inputs (no ``.rdd``) fall through untouched.
    """
    if os.environ.get(_ENV_FLAG, "1").lower() in ("0", "false"):
        return df
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if target <= 1 or nparts >= max(1, int(target * min_ratio)):
        return df
    return df.repartition(target)

"""Structured Streaming analogue of the incremental aggregate cache.

The batch cache in :mod:`..session` IS a manually-managed stateful streaming
aggregation: cached partial state ≙ the state store, the watermark ≙ the
processed-offset frontier, and the `ts >= watermark` refresh ≙ the new-data
micro-batch (SURVEY §7.6).  This module expresses the same computation with
Spark's native machinery for pipelines that prefer a standing stream over
repeated batch queries — same partial/merge algebra, Spark keeps the state.

Design notes for scale:
* the aggregation uses event-time windows + ``withWatermark`` so state for
  closed windows is evicted — bounded state, late data beyond the watermark
  dropped (the batch cache documents the identical append-only contract);
* ``Trigger.AvailableNow`` turns the same standing query into an incremental
  batch job — the deployment mode that matches the reference's
  "repeated query over a growing table" usage;
* sinks: memory (tests), parquet/kafka in production via ``start_query``.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parquet_stream(
    spark: SparkSession,
    path: str,
    ns_timestamp_columns: Sequence[str] = (),
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source stream over a parquet path (the streaming analogue of the
    reference demo's growing MemTable, ``examples/demo.rs:17-37``).

    ``ns_timestamp_columns`` get the same (timestamp, raw-ns shadow)
    normalization as the batch source layer (``sources/tables.py``
    ``with_ns_shadow``) — works whether the source column is an epoch-ns
    long, µs TIMESTAMP, or TIMESTAMP_NTZ.
    """
    from ..sources.tables import with_ns_shadow

    # file streams need an explicit schema; reuse the batch reader's
    sch = spark.read.parquet(path).schema
    reader = spark.readStream.schema(sch)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return with_ns_shadow(df, *ns_timestamp_columns)


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: Sequence[str],
    agg_exprs: Dict[str, "F.Column"],
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermark.

    The streaming twin of the batch cache's temporal-bucket group-by:
    ``window(ts, '1 hour')`` ≙ ``date_trunc('hour', ts)`` buckets;
    ``withWatermark`` ≙ the append-only/late-data contract (SURVEY §4.4.1).
    Emits one row per (window, groups) with ``bucket`` = window start.
    """
    w = stream.withWatermark(ts_col, watermark_delay)
    grouped = w.groupBy(
        F.window(F.col(ts_col), window_duration).alias("__w"),
        *[F.col(c) for c in group_cols],
    ).agg(*[c.alias(n) for n, c in agg_exprs.items()])
    return grouped.select(
        F.col("__w.start").alias("bucket"),
        *[F.col(c) for c in group_cols],
        *[F.col(n) for n in agg_exprs.keys()],
    )


def run_available_now(
    agg: DataFrame,
    sink_table: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
    timeout_sec: int = 120,
) -> None:
    """Drain everything currently available through the streaming engine into
    an in-memory sink table, then stop — the incremental-batch deployment
    mode (each invocation processes only files added since the checkpoint,
    exactly like the batch cache's watermark refresh).

    Sharp edge: the memory sink holds only what THIS run emitted. If no new
    files arrived, no micro-batch fires and ``sink_table`` comes up empty —
    the checkpointed state is fine; it is the sink that is per-run. Use
    :func:`start_query` (parquet sink, append mode) when outputs must
    accumulate across invocations."""
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def start_query(
    agg: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    trigger_interval: Optional[str] = None,
):
    """Standing production query → parquet sink. ``append`` emits each
    window once its watermark closes (finalized buckets only)."""
    w = agg.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint_dir
    ).outputMode(output_mode)
    if trigger_interval:
        w = w.trigger(processingTime=trigger_interval)
    return w.start()

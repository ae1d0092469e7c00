"""Sequence packing: assign documents to fixed token-budget training
sequences — the step every pretraining data pipeline runs between
filtering/dedup and batch writing.

Packing rule (deterministic, whole-doc, oracle-able): documents are taken
in ascending ``id`` order and document *d* lands in sequence
``floor(prefix_tokens_before(d) / budget)`` — streaming pack WITHOUT
splitting documents: a doc whose tokens cross a budget boundary stays in
the sequence its first token lands in, so sequences may overflow by less
than one document (the loader truncates or pads; the ASSIGNMENT is what
the pipeline materializes). The rule is a pure function of the exclusive
prefix sum, which makes it verifiable in any SQL engine with one window
expression — and distributable without one global single-reducer window.

100 TB shape: a naive ``Window.orderBy(id)`` with no partition key plans
a SINGLE-partition sort — the classic scale-killer. This implementation
runs the classic two-phase distributed prefix sum instead:

1. bucket each row by a VALUE-DERIVED key (id range split into
   ``n_buckets`` width buckets off one min/max job) — a pure function of
   the id, so every job sees identical bucketing (``spark_partition_id``
   over a re-sampled range shuffle would not be stable across jobs);
2. per-bucket exclusive cumsum via a window partitioned by bucket
   (fully parallel), per-bucket totals collected to the driver
   (O(buckets) rows) and folded to exclusive offsets, rejoined as a
   broadcast — each row's global prefix = bucket offset + local cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import token_count


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 128,
) -> DataFrame:
    """Pack documents (ascending ``id_col`` order) into sequences of
    ``budget`` whitespace tokens. Returns one row per document:
    ``(id_col, n_tokens, seq_id, seq_pos)`` where ``seq_pos`` is the
    document's starting token offset within its sequence."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    lo, hi = toks.agg(F.min(id_col), F.max(id_col)).collect()[0]
    if lo is None:
        return toks.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("long").alias("seq_id"),
            F.lit(0).cast("long").alias("seq_pos"),
        )
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    bucketed = toks.withColumn(
        "__b", ((F.col(id_col) - F.lit(int(lo))) / F.lit(width)).cast("int")
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "__local_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # O(buckets) driver fold → exclusive offsets (buckets are id-ordered
    # by construction: width buckets over the id range)
    psums = (
        bucketed.groupBy("__b").agg(F.sum("n_tokens").alias("__t")).collect()
    )
    psums.sort(key=lambda r: r["__b"])
    offsets, acc = [], 0
    for r in psums:
        offsets.append((int(r["__b"]), acc))
        acc += int(r["__t"])
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__b int, __offset long")
    before = F.col("__offset") + F.col("__local_before")
    return (
        local.join(F.broadcast(off_df), "__b")
        .select(
            id_col,
            "n_tokens",
            F.floor(before / F.lit(budget)).cast("long").alias("seq_id"),
            (before % F.lit(budget)).cast("long").alias("seq_pos"),
        )
    )


def sequence_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence fill report over :func:`pack_sequences` output:
    ``(seq_id, n_docs, n_tokens, fill_ratio, overflow)``. ``overflow``
    is the tokens past the budget contributed by a boundary-crossing
    document (what the loader will truncate or spill into padding)."""
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            "seq_id",
            "n_docs",
            "n_tokens",
            F.round(
                F.least(F.col("n_tokens"), F.lit(budget)).cast("double")
                / F.lit(float(budget)),
                6,
            ).alias("fill_ratio"),
            F.greatest(
                F.col("n_tokens") - F.lit(budget), F.lit(0)
            ).cast("long").alias("overflow"),
        )
    )

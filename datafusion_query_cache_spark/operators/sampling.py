"""Deterministic sampling/splitting for training-data pipelines.

A 100 TB corpus needs reproducible, coordination-free sampling: every
executor must assign the same row to the same split on every run, with no
shared RNG state and no shuffle. Both operators here key on
``md5(id)`` — a pure, portable scan-side expression — and compare a hex
PREFIX of the digest against precomputed hex thresholds, so the whole
assignment is one whole-stage-codegen projection:

* no shuffle, no UDF, no driver round-trip;
* the same row lands in the same split across engines (the DuckDB oracle
  is the literally-equivalent expression) and across runs;
* adding data never reassigns existing rows (hash-stability — the same
  property the dedup/index operators rely on).

This replaces the usual ``df.sample()``/``randomSplit()`` pair, which are
seed-and-partitioning dependent (a repartition changes the sample) —
unacceptable for training-data lineage.

Reference: the reference engine has no sampling surface (its TABLESAMPLE
support is inherited from DataFusion and non-deterministic); these are
beyond-reference training-pipeline operators in the same family as
``operators/dedup.py``.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: width of the digest prefix used for thresholding: 8 hex chars = 32 bits
#: of uniformity, plenty for split fractions while keeping the threshold
#: literals short. The full digest stays available for tie-free ordering.
_PREFIX = 8
_SPACE = 16 ** _PREFIX


def _hex_threshold(p: float) -> str:
    """Cumulative probability → inclusive-exclusive hex boundary literal.

    A row is below the boundary iff its digest prefix (uniform on
    [0, 16^8)) is < floor(p · 16^8); string comparison on fixed-width
    lowercase hex is exactly numeric comparison.
    """
    v = min(_SPACE, max(0, int(p * _SPACE)))
    return format(v, f"0{_PREFIX + 1}x")[-_PREFIX:] if v < _SPACE else "g" * _PREFIX
    # "gggggggg" sorts above every hex digit → p=1.0 admits everything


def _digest_prefix(id_col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _PREFIX)


def split_column(
    id_col: Column,
    weights: Dict[str, float],
    salt: str = "",
) -> Column:
    """A deterministic split-label Column (e.g. train/val/test).

    ``weights`` maps label → fraction (need not sum to 1; the remainder is
    labelled NULL — useful for "sample 1% and ignore the rest"). Label
    order follows dict order; boundaries are cumulative. ``salt`` derives
    independent assignments from the same ids (re-splitting for a new
    experiment without touching the old lineage).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    h = _digest_prefix(id_col, salt)
    expr = None
    cum = 0.0
    lo = _hex_threshold(0.0)
    for label, w in weights.items():
        cum += w
        hi = _hex_threshold(cum)
        cond = (h >= F.lit(lo)) & (h < F.lit(hi))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo = hi
    return expr


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    weights: Dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label — one projection, no shuffle.

    100 TB design: scan-side expression only; partitioning untouched, so a
    downstream ``write.partitionBy(out_col)`` is the single shuffle the
    whole split pipeline pays.
    """
    return df.withColumn(out_col, split_column(F.col(id_col), weights, salt))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    id_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling (quality-tier curriculum mixes).

    ``fractions`` maps stratum value → keep-fraction; strata not listed
    keep ``default_fraction``. Same hash-threshold trick, so the sample is
    a stable FUNCTION of (id, salt) — repartition/rerun/append never
    changes membership, and two samples with the same salt are nested
    (fraction 0.1 ⊂ fraction 0.2): exactly what curriculum scaling runs
    need.
    """
    h = _digest_prefix(F.col(id_col), salt)
    thr = None
    for val, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(val)
        lit = F.lit(_hex_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = (
        thr.otherwise(F.lit(_hex_threshold(default_fraction)))
        if thr is not None
        else F.lit(_hex_threshold(default_fraction))
    )
    return df.filter(h < thr)


def mixture_upsample(
    df: DataFrame,
    strata_col: str,
    factors: Dict[str, float],
    id_col: str,
    salt: str = "",
    default_factor: float = 1.0,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic domain-mixture UP-sampling (epoch weighting): each
    stratum's rows are repeated ``factors[stratum]`` times in expectation
    — the DoReMi / Pile-style mixture step where high-quality domains see
    >1 epoch while bulk web sees <1.

    A factor ``f`` yields ``floor(f)`` full copies per row plus one more
    for the rows whose hash prefix falls below the ``f - floor(f)``
    threshold — so the EXACT copy count of every row is a stable function
    of ``(id, salt)``: repartition/rerun/append never change it, and the
    fractional top-up set is NESTED across factors with the same salt
    (the ``stratified_sample`` property, extended above 1.0). Factors
    below 1 degenerate to stratified sampling; 0 drops the stratum.

    Returns the input columns plus ``copy_col`` (1..n per source row) so
    downstream shuffles/dedup can tell copies apart.

    100 TB design: one scan-side projection (CASE thresholds + an
    ``explode(sequence)``) — no shuffle, no UDF, no driver state; output
    partitioning follows the input's, and the explode multiplies rows
    inside the scan stage where a downstream repartition would rebalance
    anyway.
    """
    h = _digest_prefix(F.col(id_col), salt)

    def _cases(fn):
        out = None
        for val, frac in factors.items():
            cond = F.col(strata_col) == F.lit(val)
            lit = fn(frac)
            out = F.when(cond, lit) if out is None else out.when(cond, lit)
        dflt = fn(default_factor)
        return out.otherwise(dflt) if out is not None else dflt

    base = _cases(lambda f: F.lit(int(f)))
    thr = _cases(lambda f: F.lit(_hex_threshold(f - int(f))))
    n = (base + (h < thr).cast("int")).alias("__qc_n")
    return (
        df.withColumn("__qc_n", n)
        .filter(F.col("__qc_n") > 0)
        .select(
            *df.columns,
            F.explode(
                F.sequence(F.lit(1), F.col("__qc_n"))
            ).alias(copy_col),
        )
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shard`` (hash-assigned) and a dense ``pos`` within its shard
    (ordered by the same digest) — the final pre-training step that
    turns a curated corpus into a reproducible read order.

    Keyed on the ``md5`` prefix machinery above, so the assignment is a
    pure function of ``(id, salt)``: repartition/rerun/append never
    reorder EXISTING rows' relative positions within a shard (appends
    interleave by hash — by design, late-arriving docs don't all land
    at the tail), and a different ``salt`` is a fresh permutation.

    100 TB shape: this is exactly ONE Spark shuffle (hash partition on
    ``shard``) plus a per-shard sort — never a single global sort; with
    ``n_shards`` ≈ the cluster's write parallelism the output is ready
    for ``write.partitionBy("shard")``. Digest ties cannot happen on
    distinct ids (full 32-hex digest compared; equal digest ⇒ equal
    salted id string for md5's purposes at any realistic corpus size) —
    ``pos`` still tie-breaks on the id for total determinism.
    """
    from pyspark.sql import Window as _W

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    w = _W.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        df.select(
            F.col(id_col), shard.alias("shard"), h.alias("__h")
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )

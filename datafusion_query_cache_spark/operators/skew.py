"""Skew-aware aggregation: salted two-phase group-by.

At 100 TB a handful of hot keys (one bot user, one boilerplate document)
can pin an entire aggregation on one reducer. The classic fix is salting:
shuffle on ``(key, salt)`` first so the hot key spreads over ``buckets``
reducers, then merge the per-salt partials — which is *exactly* the
partial/merge algebra the cache engine is built on
(:mod:`..functions.partial`), reused here verbatim.

AQE's skew-join handling covers joins; this covers aggregations, where AQE
does not re-split a single hot hash-aggregation key.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.partial import decompose_agg
from ..plans.ir import AggCall, Col, Star


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Dict[str, AggCall],
    buckets: int = 32,
) -> DataFrame:
    """``df.groupBy(keys).agg(...)`` with a salt pre-phase.

    ``aggs``: output-name → :class:`AggCall` (any decomposable aggregate
    from the engine's algebra — count/sum/avg/min/max/var/corr/...).

    Phase 1 shuffles on ``(keys, salt)`` — hot keys fan out over ``buckets``
    tasks; phase 2 merges the tiny per-salt states on ``keys``. Results are
    identical to the direct aggregation (split-invariance law, property
    tested in tests/test_partial_algebra.py).
    """
    decs = {name: decompose_agg(call, str(i)) for i, (name, call) in enumerate(aggs.items())}

    salt = (F.rand(seed=42) * buckets).cast("int").alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            c.alias(n)
            for dec in decs.values()
            for n, c in dec.partial.items()
        ]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[
            c.alias(n)
            for dec in decs.values()
            for n, c in dec.merge.items()
        ]
    )
    return phase2.select(
        *keys, *[dec.finalize.alias(name) for name, dec in decs.items()]
    )

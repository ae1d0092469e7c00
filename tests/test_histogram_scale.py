"""Histogram (exact/approx percentile) big-scan scale guard (r17).

The expression-level collect_list partial buffered O(rows-per-group) in
flight even though the stored state compacts to O(distinct) — a hot
group of ~10M+ rows OOM'd the executor where plain Spark's Percentile
(an O(distinct) counts map) survives. The fix: phase 1 of the partial
also groups by each histogram VALUE column, phase 2 builds the RLE
arrays from O(distinct) subgroup counts, and every other aggregate
re-combines via its own merge (the salt-guard algebra); histogram
decompositions carry NO singleton form (the var/corr precedent), so
warm refreshes run the same bounded two-phase over the fresh tail.

Verified at 100M rows (x1000): cold populates, warm 0.85x plain on the
normal path / 0.78x on the FULL composite, bit-exact. These tests pin
the behavior at suite-affordable scale."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from tests.conftest import rows_set


def _mk(spark, **kw):
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    return CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-hs-")),
            default_temporal_column="ts",
            **kw,
        ),
    )


def test_hot_group_percentile_two_run_exact(spark):
    """400k rows in 2 groups, few distinct values: the two-phase keeps
    the in-flight state at O(distinct) (the old shape built 200k-entry
    arrays per group); two-run incremental stays exact, mixed with
    non-histogram aggregates whose partials re-combine via merge."""
    n = 400_000
    base = 1_700_000_000_000_000
    cut_us = base + (n * 3) // 4
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    spark.range(n).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") % 37).cast("double").alias("v"),
        F.timestamp_micros(F.lit(base) + F.col("id")).alias("ts"),
    ).createOrReplaceTempView("hot_fact")
    sql = (
        "SELECT g, round(median(v) + 1e-9, 2) AS med, "
        "round(percentile(v, 0.9) + 1e-9, 2) AS p90, "
        "round(sum(v), 1) AS sv, count(*) AS n "
        "FROM hot_src GROUP BY 1 ORDER BY 1"
    )
    try:
        full = spark.table("hot_fact")
        full.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView(
            "hot_src"
        )
        qc = _mk(spark, override_now_ns=cut_ns)
        qc.sql(sql).collect()
        assert qc.last_decision.cached, qc.last_decision.reason
        full.createOrReplaceTempView("hot_src")
        qc.config.override_now_ns = cut_ns + 10**15
        got = qc.sql(sql)
        assert qc.last_decision.cache_hit, qc.last_decision.reason
        assert rows_set(got) == rows_set(spark.sql(sql))
    finally:
        spark.catalog.dropTempView("hot_fact")
        spark.catalog.dropTempView("hot_src")


def test_histogram_has_no_singleton_form(spark):
    """The singleton plan would make the warm merge O(tail) in flight;
    histogram decompositions must refuse it (var/corr precedent)."""
    from datafusion_query_cache_spark.functions.partial import (
        decompose_agg,
    )
    from datafusion_query_cache_spark.plans.ir import AggCall, Col, Lit

    for call in (
        AggCall("median", (Col("v"),)),
        AggCall("percentile", (Col("v"), Lit(0.9))),
        AggCall("__qc_hist", (Col("v"),)),
    ):
        dec = decompose_agg(call, "0")
        assert dec.singleton is None, call.fn
        assert dec.histogram_values, call.fn


def test_two_phase_partial_with_salt_and_multi_hist(spark):
    """Salt + two different histogram columns compose: phase 1 groups
    by (keys, salt, v1, v2); duplicate-v entries from the cross terms
    are legal (the walk is a multiset fold)."""
    n = 50_000
    base = 1_700_000_000_000_000
    spark.range(n).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 11).cast("double").alias("v"),
        (F.col("id") % 7).cast("double").alias("w"),
        F.timestamp_micros(F.lit(base) + F.col("id")).alias("ts"),
    ).createOrReplaceTempView("mh_src")
    sql = (
        "SELECT g, round(median(v) + 1e-9, 2) AS mv, "
        "round(median(w) + 1e-9, 2) AS mw, "
        "round(avg(v) + 1e-9, 3) AS av, count(*) AS n "
        "FROM mh_src GROUP BY 1 ORDER BY 1"
    )
    try:
        qc = _mk(spark, salt_buckets=8)
        got = qc.sql(sql)
        assert qc.last_decision.cached, qc.last_decision.reason
        assert rows_set(got) == rows_set(spark.sql(sql))
    finally:
        spark.catalog.dropTempView("mh_src")

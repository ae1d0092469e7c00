"""Partition-aware watermark bounds: the refresh scan must prune whole
partitions on a date-partitioned table (config.temporal_partition_columns)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pe") / "events_part")
    ev = spark.table("events")
    ev.withColumn("d", F.to_date("ts")).write.partitionBy("d").parquet(path)
    df = spark.read.parquet(path)
    df.createOrReplaceTempView("events_part")
    return path


def test_partitioned_refresh_prunes_partitions(spark, tmp_path, partitioned_events):
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    cut = dt.datetime(2024, 1, 25)
    cut_ns = int(cut.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "pc")),
            override_now_ns=cut_ns,
            temporal_partition_columns={"ts": "d"},
        ),
    )
    sql = (
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS s "
        "FROM events_part GROUP BY 1"
    )
    qc.sql(sql).collect()

    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    # the refresh program (whichever warm path ran) is exposed for plan
    # inspection on last_refresh_df
    plan = qc.last_refresh_df._jdf.queryExecution().executedPlan().toString()
    # at least one scan (the fresh events_part side) must carry partition
    # filters on d — the cached-state scan legitimately has none
    segs = [p.split("]", 1)[0] for p in plan.split("PartitionFilters: [")[1:]]
    assert any("d#" in s for s in segs), f"no partition filters in: {segs}"
    # and results stay exact
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_partitioned_results_exact_over_refreshes(spark, tmp_path, partitioned_events):
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    sql = "SELECT count(*) AS n, round(sum(value), 2) AS s FROM events_part"
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "pc2")),
            temporal_partition_columns={"ts": "d"},
        ),
    )
    for cut_day in (10, 20, 31):
        cut_ns = int(
            dt.datetime(2024, 1, cut_day, tzinfo=dt.timezone.utc).timestamp() * 1e9
        )
        qc.config.override_now_ns = cut_ns
        got = qc.sql(sql)
        expect = spark.sql(
            sql.replace(
                "FROM events_part",
                f"FROM events_part WHERE ts < TIMESTAMP '2024-01-{cut_day:02d}'",
            )
        )
        assert rows_set(got) == rows_set(expect)


def test_dyn_template_pushes_or_of_ranges(spark, tmp_path):
    """Regression pin for the one-scan dynamic template: the fused fact
    scan's OR-of-ranges (fresh tail ∪ boundary bucket) must reach parquet
    PushedFilters as a fully-translatable Or. The optimizer's distributive
    rewrite `(A∨B)∧(A∨C)→A∨(B∧C)` silently kills pushdown for BOTH ranges
    if any boundary-side atom (e.g. a date_trunc bucket equality) is left
    in the exact conjunct — exactly what happened before the atoms were
    made identity-equal (r6)."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    now1 = int(
        dt.datetime(2024, 1, 26, tzinfo=dt.timezone.utc).timestamp() * 1e9
    )
    now2 = int(
        dt.datetime(2024, 1, 29, tzinfo=dt.timezone.utc).timestamp() * 1e9
    )
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "dp")),
            override_now_ns=now1,
        ),
    )
    # min_by has no Python merge mirror, so the nano/lite driver tiers
    # reject and the FUSED TEMPLATE (this test's subject) must run
    # (corr moved to the central co-moment state in r11: it now has a py
    # mirror → lite, and its HOF merge is template-ineligible anyway)
    sql = (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n, "
        "min_by(event_id, value) AS lo "
        "FROM events WHERE ts > now() - INTERVAL 10 DAY GROUP BY 1"
    )
    qc.sql(sql).collect()
    qc.config.override_now_ns = now2
    qc.sql(sql).collect()
    assert qc.last_decision.cache_hit
    assert qc.last_decision.refresh_tier == "template"
    assert isinstance(qc.last_decision.dynamic_lower, str)  # template ran
    plan = qc.last_refresh_df._jdf.queryExecution().executedPlan().toString()
    pushed = [p.split("]", 1)[0] for p in plan.split("PushedFilters: [")[1:]]
    ors = [s for s in pushed if "Or(" in s]
    assert ors, f"OR-of-ranges not pushed to any scan: {pushed}"
    # both sides of the pushed Or are range conjunctions on the ts column
    assert any("And(" in s and s.count("ts") >= 3 for s in ors), ors


def test_dyn_lite_pushes_or_of_ranges(spark, tmp_path):
    """Same pushdown pin for the LITE tier's plain-sized job (a predicate
    forces past nano; count/sum keep the lite driver merge eligible)."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    now1 = int(
        dt.datetime(2024, 1, 26, tzinfo=dt.timezone.utc).timestamp() * 1e9
    )
    now2 = int(
        dt.datetime(2024, 1, 29, tzinfo=dt.timezone.utc).timestamp() * 1e9
    )
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "dpl")),
            override_now_ns=now1,
        ),
    )
    # an OR-of-conditions predicate is outside the nano mask mirror, so
    # the LITE tier (this test's subject) must run the Spark job
    sql = (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events WHERE (value > 0 OR event_type = 'click') "
        "AND ts > now() - INTERVAL 10 DAY GROUP BY 1"
    )
    qc.sql(sql).collect()
    qc.config.override_now_ns = now2
    qc.sql(sql).collect()
    assert qc.last_decision.cache_hit
    assert qc.last_decision.refresh_tier == "lite"
    plan = qc.last_refresh_df._jdf.queryExecution().executedPlan().toString()
    pushed = [p.split("]", 1)[0] for p in plan.split("PushedFilters: [")[1:]]
    ors = [s for s in pushed if "Or(" in s]
    assert ors, f"OR-of-ranges not pushed to any scan: {pushed}"
    # the pushed-filter print truncates; the Or-of-And on ts is the pin
    assert any("Or(And(" in s and "ts" in s for s in ors), ors


def test_template_date_bounds_survive_tz_skew(spark, tmp_path):
    """r12 vanilla-fuzz find: the dyn template's partition-date pruning
    bounds derived dates in naive UTC (tokens) / the current session tz
    (boundary-leg CASTs), but a partition layout may have been
    materialized under a DIFFERENT session timezone — a Chicago-tz
    session over this repo's UTC-built date partitions dropped a
    boundary-bucket row (silent undercount). All date bounds are now
    widened ±1 day, which is sound under any fixed-offset skew; the
    exact ts bounds still filter rows. This test mirrors the failing
    scenario inside the UTC session by checking the rendered SQL bounds
    directly."""
    from datafusion_query_cache_spark.tiers import RefreshTiers

    sub = RefreshTiers._sub_time_tokens  # staticmethod
    # 2024-01-28 05:26 UTC .. 2024-01-30 00:00 UTC
    lo_ns = 1706419576320708000
    hi_ns = 1706572800000000000
    sql = sub(
        "d >= DATE'__QC_FLO_D__' AND d <= DATE'__QC_FHI_D__'",
        "F", lo_ns, hi_ns,
    )
    # UTC dates are Jan 28 / Jan 30; the widened bounds must be Jan 27 /
    # Jan 31 so a session-tz date one day behind/ahead is never pruned
    assert "DATE'2024-01-27'" in sql and "DATE'2024-01-31'" in sql, sql

"""Temporal-bucket coarsening subsumption: a FINER-bucketed entry for the
same query answers a coarser never-seen-before query by re-truncation +
merge (TimescaleDB continuous-aggregate rollup reuse; sound because
date_trunc(coarse, date_trunc(fine, ts)) == date_trunc(coarse, ts) when fine
nests into coarse, and merge is associative)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set

HOURLY = (
    "SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n, "
    "round(sum(value), 2) AS s FROM events_cz GROUP BY 1, 2"
)
DAILY = (
    "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n, "
    "round(sum(value), 2) AS s FROM events_cz GROUP BY 1, 2"
)


def _cut(spark):
    return int(spark.table("events").approxQuantile("ts_ns", [0.5], 0.0)[0])


def test_daily_served_from_hourly_state(spark, qc):
    ev = spark.table("events")
    cut = _cut(spark)
    qc.config.override_now_ns = cut
    ev.filter(F.col("ts_ns") < F.lit(cut)).createOrReplaceTempView("events_cz")
    qc.sql(HOURLY).collect()

    ev.createOrReplaceTempView("events_cz")
    qc.config.override_now_ns = cut + 10**18
    got = qc.sql(DAILY)
    d = qc.last_decision
    assert d.cache_hit and d.semantic_donor is not None
    assert d.watermark_ns == cut  # scanned only rows past the donor watermark
    assert rows_set(got) == rows_set(
        spark.sql(DAILY.replace("events_cz", "events"))
    )
    # the daily entry is now independent: next run is a plain hit
    qc.config.override_now_ns = cut + 2 * 10**18
    got2 = qc.sql(DAILY)
    assert qc.last_decision.cache_hit and qc.last_decision.semantic_donor is None
    assert rows_set(got2) == rows_set(
        spark.sql(DAILY.replace("events_cz", "events"))
    )


def test_week_never_serves_month(spark, qc):
    """Weeks cross month boundaries: a weekly entry must NOT donate to a
    monthly query (re-truncating week starts misplaces rows)."""
    ev = spark.table("events")
    cut = _cut(spark)
    weekly = (
        "SELECT CAST(date_trunc('week', ts) AS DATE) AS w, count(*) AS n "
        "FROM events_cz GROUP BY 1"
    )
    monthly = (
        "SELECT CAST(date_trunc('month', ts) AS DATE) AS m, count(*) AS n "
        "FROM events_cz GROUP BY 1"
    )
    ev.createOrReplaceTempView("events_cz")
    qc.config.override_now_ns = cut + 10**18
    qc.sql(weekly).collect()
    qc.config.override_now_ns = cut + 10**18 + 1
    got = qc.sql(monthly)
    assert qc.last_decision.semantic_donor is None
    assert rows_set(got) == rows_set(
        spark.sql(monthly.replace("events_cz", "events"))
    )


def test_different_predicate_no_donor(spark, qc):
    ev = spark.table("events")
    cut = _cut(spark)
    ev.createOrReplaceTempView("events_cz")
    qc.config.override_now_ns = cut + 10**18
    qc.sql(HOURLY.replace("GROUP BY", "WHERE value > 5 GROUP BY")).collect()
    qc.config.override_now_ns = cut + 10**18 + 1
    qc.sql(DAILY).collect()  # no predicate → must not reuse the filtered state
    assert qc.last_decision.semantic_donor is None


def test_coarsen_donor_with_data_watermark_mode(spark, tmp_path):
    """Coarsening donor hit under watermark_mode='data': the donor-branch
    scan must be bounded by the data-derived watermark (data_scan_wm), and
    the coarse answer must stay exact with late-arriving data."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    ev = spark.table("events")
    cut = _cut(spark)
    far_future = cut + 10**18
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-cz-data")),
        default_temporal_column="ts",
        override_now_ns=far_future,  # clock far ahead: 'now' mode would
        watermark_mode="data",       # freeze out the late second half
    )
    qc = CachedSparkSession(spark, cfg)
    ev.filter(F.col("ts_ns") < F.lit(cut)).createOrReplaceTempView("events_cz")
    qc.sql(HOURLY).collect()  # hourly donor over the early half

    # the rest "arrives late" (before far_future); the DAILY query has
    # never run — served by coarsening the hourly donor + data-bounded scan
    ev.createOrReplaceTempView("events_cz")
    qc.config.override_now_ns = far_future + 10**12
    got = qc.sql(DAILY)
    d = qc.last_decision
    assert d.cache_hit and d.semantic_donor is not None
    assert rows_set(got) == rows_set(spark.sql(DAILY))

    # and the stored watermark is data-derived (max+1), not the far clock
    ent = cfg.cache.entry(d.fingerprint)
    assert cut < ent.watermark_ns < far_future


def test_donor_refused_across_session_timezones(spark, tmp_path):
    """A finer-bucket donor built under a DIFFERENT session timezone must
    be refused: bucket values are tz-dependent, so re-truncating UTC-built
    hour starts in a Chicago session yields buckets correct in neither tz
    (the r12 |tz= fingerprint fix, applied to the coarsening-donor path)."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    ev = spark.table("events")
    cut = _cut(spark)
    cdir = str(tmp_path / "qc-cz-tz")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        qc1 = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(cdir),
                default_temporal_column="ts",
                override_now_ns=cut,
            ),
        )
        ev.filter(F.col("ts_ns") < F.lit(cut)).createOrReplaceTempView(
            "events_cz"
        )
        qc1.sql(HOURLY).collect()  # donor built in the ambient (UTC) tz

        spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
        ev.createOrReplaceTempView("events_cz")
        qc2 = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(cdir),
                default_temporal_column="ts",
                override_now_ns=cut + 10**18,
            ),
        )
        got = qc2.sql(DAILY)
        assert qc2.last_decision.semantic_donor is None
        # Chicago-correct day buckets, computed from the raw table
        assert rows_set(got) == rows_set(
            spark.sql(DAILY.replace("events_cz", "events"))
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
        ev.createOrReplaceTempView("events_cz")


def test_donor_shared_across_sessions_same_tz(spark, tmp_path):
    """Positive control for the tz guard: a NEW session object sharing the
    durable cache under the SAME timezone still gets the coarsening donor."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    ev = spark.table("events")
    cut = _cut(spark)
    cdir = str(tmp_path / "qc-cz-same")
    qc1 = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(cdir),
            default_temporal_column="ts",
            override_now_ns=cut,
        ),
    )
    ev.filter(F.col("ts_ns") < F.lit(cut)).createOrReplaceTempView("events_cz")
    qc1.sql(HOURLY).collect()

    ev.createOrReplaceTempView("events_cz")
    qc2 = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(cdir),
            default_temporal_column="ts",
            override_now_ns=cut + 10**18,
        ),
    )
    got = qc2.sql(DAILY)
    d = qc2.last_decision
    assert d.cache_hit and d.semantic_donor is not None
    assert rows_set(got) == rows_set(
        spark.sql(DAILY.replace("events_cz", "events"))
    )

"""``CachedSparkSession.audit`` — the trust-but-verify hook (r10 verdict
item 5): recompute sampled group buckets from the raw table and compare
against the finalized cached state through the decision log.

The append-only contract silently drops late data (ts < watermark arriving
after the run — SURVEY §4.4.1, same as the reference); audit() is how a
production pipeline detects that divergence instead of trusting it away.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _mk(spark, log=None):
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        MemoryQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.log import HistoryLog

    cfg = QueryCacheConfig(
        cache=MemoryQueryCache(),
        default_temporal_column="ts",
        log=log or HistoryLog(),
        strict_errors=True,
    )
    return CachedSparkSession(spark, cfg)


SQL = (
    "SELECT event_type, count(*) AS n, round(sum(value), 2) AS s, "
    "round(avg(value) + 1e-9, 4) AS av FROM events GROUP BY 1 ORDER BY 1"
)


def test_audit_clean_on_append_only(spark, qc_mem):
    qc = _mk(spark)
    qc.sql(SQL).collect()
    fp = qc.last_decision.fingerprint
    report = qc.audit(fp, buckets=5)
    assert report.ok is True
    assert len(report.buckets) == 5
    msgs = qc.config.log.messages()
    assert any("buckets OK" in m for m in msgs)
    assert not any("DIVERGED" in m for m in msgs)


def test_audit_detects_late_row_divergence(spark, qc_mem):
    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    qc = _mk(spark)
    try:
        # run over the truncated view; the entry's watermark = cut
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
        qc.config.override_now_ns = cut_ns
        qc.sql(SQL).collect()
        fp = qc.last_decision.fingerprint
        assert qc.audit(fp, buckets=5).ok is True

        # INJECT late data: re-register the view with extra rows whose ts
        # is BEFORE the watermark — the state never saw them and no fresh
        # scan ever will (the append-only contract violation)
        late = ev.filter(F.col("ts") < F.lit(cut)).limit(50)
        ev.filter(F.col("ts") < F.lit(cut)).unionByName(
            late
        ).createOrReplaceTempView("events")
        report = qc.audit(fp, buckets=5)
        assert report.ok is False
        bad = [b for b in report.buckets if not b.ok]
        assert bad and any(d[0] == "n" for b in bad for d in b.diffs)
        assert any("DIVERGED" in m for m in qc.config.log.messages())
    finally:
        ev.createOrReplaceTempView("events")


def test_audit_global_aggregate(spark, qc_mem):
    qc = _mk(spark)
    qc.sql(
        "SELECT count(*) AS n, min(value) AS mn, max(value) AS mx FROM events"
    ).collect()
    fp = qc.last_decision.fingerprint
    report = qc.audit(fp)
    assert report.ok is True and len(report.buckets) == 1
    assert report.buckets[0].key == ()


def test_audit_unknown_fingerprint_raises(spark, qc_mem):
    qc = _mk(spark)
    with pytest.raises(KeyError, match="not planned"):
        qc.audit("no-such-fingerprint")


def test_audit_survives_refresh(spark, qc_mem):
    """Audit after an incremental refresh checks the MERGED state."""
    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    qc = _mk(spark)
    try:
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
        qc.config.override_now_ns = cut_ns
        qc.sql(SQL).collect()
        fp = qc.last_decision.fingerprint
        ev.createOrReplaceTempView("events")
        qc.config.override_now_ns = mx + 10**9
        qc.sql(SQL).collect()
        assert qc.last_decision.cache_hit
        assert qc.audit(fp, buckets=5).ok is True
    finally:
        ev.createOrReplaceTempView("events")


# -- explain() ----------------------------------------------------------


def test_explain_traces_cached_and_passthrough(spark, qc_mem):
    qc = _mk(spark)
    tr = qc.explain(SQL)
    assert tr.decision.cached and tr.df is not None
    s = str(tr)
    assert "cached:    True" in s and "fingerprint:" in s and "log:" in s
    # second call: hit trace carries the tier and fresh window
    tr2 = qc.explain(SQL)
    assert tr2.decision.cache_hit
    assert "hit:       True" in str(tr2)
    # passthrough trace names the reason
    tr3 = qc.explain("SELECT e1.event_id FROM events e1 CROSS JOIN events e2 LIMIT 1")
    assert not tr3.decision.cached
    assert "reason:" in str(tr3)
    # the session's own log still received the records (tee, not divert)
    assert qc.config.log.messages()


def test_audit_filter_rowset(spark, qc_mem):
    """Row-set (filter) entries audit via hash-bucket counts."""
    import datetime as dt

    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    qc = _mk(spark)
    sql = "SELECT event_id, event_type, value FROM events WHERE value > 100"
    try:
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
        qc.config.override_now_ns = cut_ns
        qc.sql(sql).collect()
        fp = qc.last_decision.fingerprint
        assert qc.audit(fp).ok is True

        # inject late matching rows → some bucket count diverges
        late = ev.filter(
            (F.col("ts") < F.lit(cut)) & (F.col("value") > 100)
        ).limit(20)
        ev.filter(F.col("ts") < F.lit(cut)).unionByName(late) \
            .createOrReplaceTempView("events")
        report = qc.audit(fp)
        assert report.ok is False
        assert any("DIVERGED" in m for m in qc.config.log.messages())
    finally:
        ev.createOrReplaceTempView("events")


def test_audit_filter_topk(spark, qc_mem):
    qc = _mk(spark)
    sql = (
        "SELECT event_id, value FROM events WHERE event_type = 'click' "
        "ORDER BY value DESC, event_id LIMIT 15"
    )
    qc.sql(sql).collect()
    fp = qc.last_decision.fingerprint
    report = qc.audit(fp)
    assert report.ok is True and report.buckets[0].key == ("topk",)


# -- audit_heal='invalidate' (r12, VERDICT item 5) ------------------------


def _heal_session(spark, cache):
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.log import HistoryLog

    return CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=cache,
            default_temporal_column="ts",
            log=HistoryLog(),
            strict_errors=True,
            audit_heal="invalidate",
        ),
    )


@pytest.mark.parametrize("backend", ["memory", "parquet"])
def test_audit_heal_invalidates_and_recomputes(spark, tmp_path, backend):
    """Late row injected → audit detects AND invalidates the entry → the
    next query is a full-recompute MISS whose result matches plain Spark
    on the now-diverged data, and the stored state is fresh."""
    from datafusion_query_cache_spark import MemoryQueryCache, ParquetQueryCache
    from tests.conftest import rows_set

    cache = (
        MemoryQueryCache()
        if backend == "memory"
        else ParquetQueryCache(str(tmp_path / "heal"))
    )
    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    qc = _heal_session(spark, cache)
    try:
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
        qc.config.override_now_ns = cut_ns
        qc.sql(SQL).collect()
        fp = qc.last_decision.fingerprint
        assert qc.audit(fp, buckets=5).ok is True  # clean: no heal

        # inject LATE rows (ts < watermark): append-only violation
        late = ev.filter(F.col("ts") < F.lit(cut)).limit(50)
        ev.filter(F.col("ts") < F.lit(cut)).unionByName(
            late
        ).createOrReplaceTempView("events")
        report = qc.audit(fp, buckets=5)
        assert report.ok is False
        assert any("INVALIDATED" in m for m in qc.config.log.messages())
        # entry is gone
        assert not qc.config.cache.entry(fp).occupied

        # next query: full-recompute MISS, result ≡ plain on diverged data
        qc.config.override_now_ns = cut_ns + 10**9
        got = qc.sql(SQL)
        d = qc.last_decision
        assert d.cached and not d.cache_hit and d.fingerprint == fp
        assert rows_set(got) == rows_set(spark.sql(SQL))
        # and the fresh entry audits clean again
        assert qc.audit(fp, buckets=5).ok is True
    finally:
        ev.createOrReplaceTempView("events")


def test_audit_heal_off_by_default(spark, qc_mem):
    """Default policy reports only — the entry survives a divergence."""
    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    qc = _mk(spark)
    try:
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
        qc.config.override_now_ns = cut_ns
        qc.sql(SQL).collect()
        fp = qc.last_decision.fingerprint
        late = ev.filter(F.col("ts") < F.lit(cut)).limit(50)
        ev.filter(F.col("ts") < F.lit(cut)).unionByName(
            late
        ).createOrReplaceTempView("events")
        assert qc.audit(fp, buckets=5).ok is False
        assert qc.config.cache.entry(fp).occupied  # NOT healed
        assert not any("INVALIDATED" in m for m in qc.config.log.messages())
    finally:
        ev.createOrReplaceTempView("events")


def test_audit_heal_filter_rowset(spark, tmp_path):
    """Heal applies to row-set (filter) entries too."""
    from datafusion_query_cache_spark import ParquetQueryCache
    from tests.conftest import rows_set

    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    fsql = (
        "SELECT event_id, event_type, value FROM events "
        "WHERE event_type = 'click'"
    )
    qc = _heal_session(spark, ParquetQueryCache(str(tmp_path / "fheal")))
    try:
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
        qc.config.override_now_ns = cut_ns
        qc.sql(fsql).collect()
        fp = qc.last_decision.fingerprint
        assert qc.audit(fp).ok is True
        late = ev.filter(F.col("ts") < F.lit(cut)).limit(200)
        ev.filter(F.col("ts") < F.lit(cut)).unionByName(
            late
        ).createOrReplaceTempView("events")
        assert qc.audit(fp).ok is False
        assert not qc.config.cache.entry(fp).occupied
        qc.config.override_now_ns = cut_ns + 10**9
        got = qc.sql(fsql)
        assert qc.last_decision.cached and not qc.last_decision.cache_hit
        assert rows_set(got) == rows_set(spark.sql(fsql))
    finally:
        ev.createOrReplaceTempView("events")

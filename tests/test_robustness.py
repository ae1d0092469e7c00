"""Robustness: skew salting, concurrent writers, decimals, DDL passthrough."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


def test_salted_aggregate_matches_direct(spark):
    from datafusion_query_cache_spark.operators.skew import salted_aggregate
    from datafusion_query_cache_spark.plans.ir import AggCall, Col, Star

    ev = spark.table("events")
    got = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": AggCall("count", (Star(),)),
            "s": AggCall("sum", (Col("value"),)),
            "a": AggCall("avg", (Col("value"),)),
            "mx": AggCall("max", (Col("value"),)),
        },
        buckets=8,
    )
    expect = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.avg("value").alias("a"),
        F.max("value").alias("mx"),
    )
    assert rows_set(got) == rows_set(expect)


def test_concurrent_sessions_share_cache(spark, tmp_path):
    """Two sessions on one cache dir: last-write-wins, reads never break
    (the reference's benign race, SURVEY §4.4.8)."""
    import datetime as dt

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    root = str(tmp_path / "shared")
    now = int(dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc).timestamp() * 1e9)
    qc1 = CachedSparkSession(
        spark, QueryCacheConfig(cache=ParquetQueryCache(root), override_now_ns=now)
    )
    qc2 = CachedSparkSession(
        spark, QueryCacheConfig(cache=ParquetQueryCache(root), override_now_ns=now)
    )
    sql = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"
    a = rows_set(qc1.sql(sql))
    b = rows_set(qc2.sql(sql))  # hits the entry qc1 just wrote
    assert qc2.last_decision.cache_hit
    assert a == b
    # interleaved refreshes keep serving consistent results
    qc1.config.override_now_ns = now + 10**12
    qc2.config.override_now_ns = now + 2 * 10**12
    assert rows_set(qc1.sql(sql)) == a
    assert rows_set(qc2.sql(sql)) == a


def test_decimal_inputs_cached_correctly(spark, tmp_path):
    """Decimal sum/avg through the partial-state algebra must match plain
    Spark (precision/scale promotion is the trap)."""
    import datetime as dt

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, i % 24), f"{i}.{i%100:02d}")
        for i in range(1, 200)
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp, amt string").withColumn(
        "amt", F.col("amt").cast("decimal(12,2)")
    )
    df.createOrReplaceTempView("dec_t")
    now = int(dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc).timestamp() * 1e9)
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "dec")), override_now_ns=now
        ),
    )
    sql = (
        "SELECT date_trunc('hour', ts) AS h, sum(amt) AS s, avg(amt) AS a, "
        "count(*) AS n FROM dec_t GROUP BY 1"
    )
    got = qc.sql(sql)
    assert qc.last_decision.cached, qc.last_decision.reason
    expect = spark.sql(sql)
    e = rows_set(expect)
    assert rows_set(got) == e, "decimal sum/avg must match Spark exactly"
    # exact output TYPES too: sum → decimal(p+10,s), avg → decimal(p+4,s+4)
    types = dict(got.dtypes)
    assert types["s"] == "decimal(22,2)", types
    assert types["a"] == "decimal(16,6)", types
    # run 2 (hit) must also be exact
    qc.config.override_now_ns = now + 10**12
    got2 = qc.sql(sql)
    assert qc.last_decision.cache_hit
    assert rows_set(got2) == e


def test_decimal_composite_arg_passthrough(spark, tmp_path):
    """sum(amt * 2) over a decimal column: composite arg → passthrough."""
    import datetime as dt

    from datafusion_query_cache_spark import CachedSparkSession, QueryCacheConfig

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "5.25")], "id int, ts timestamp, amt string"
    ).withColumn("amt", F.col("amt").cast("decimal(10,2)"))
    df.createOrReplaceTempView("dec_t2")
    qc = CachedSparkSession(spark, QueryCacheConfig())
    out = qc.sql("SELECT sum(amt * 2) AS s FROM dec_t2")
    assert not qc.last_decision.cached
    assert str(out.collect()[0]["s"]) == "10.50"


def test_ddl_and_commands_pass_through(qc, spark):
    qc.sql("CREATE OR REPLACE TEMP VIEW ddl_probe AS SELECT 1 AS one")
    assert not qc.last_decision.cached
    assert spark.table("ddl_probe").collect()[0]["one"] == 1
    qc.sql("DROP VIEW ddl_probe")
    assert not qc.last_decision.cached


def test_session_salted_state_matches_unsalted(spark, tmp_path):
    """config.salt_buckets routes state-building aggregations through the
    salted two-phase plan; results and stored state must be identical to
    the direct plan (merge associativity), across the full two-run
    incremental flow — including a non-singleton (HLL) aggregate, which is
    the state shape the salt guard exists for."""
    import datetime as dt

    from pyspark.sql import functions as F

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from tests.conftest import rows_set

    ev = spark.table("events")
    cut_ns = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0])
    sql = (
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS s, "
        "approx_count_distinct(user_id) AS u FROM events_salt GROUP BY 1"
    )
    results = {}
    for buckets in (0, 8):
        qc = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(str(tmp_path / f"salt{buckets}")),
                default_temporal_column="ts",
                override_now_ns=cut_ns,
                salt_buckets=buckets,
            ),
        )
        ev.filter(F.col("ts_ns") < F.lit(cut_ns)).createOrReplaceTempView(
            "events_salt"
        )
        qc.sql(sql).collect()
        assert qc.last_decision.cached, qc.last_decision.reason
        ev.createOrReplaceTempView("events_salt")
        qc.config.override_now_ns = cut_ns + 10**18
        got = qc.sql(sql)
        assert qc.last_decision.cache_hit
        results[buckets] = rows_set(got)
    assert results[0] == results[8]


def test_engine_error_degrades_to_passthrough(spark, qc):
    """An unexpected exception inside the cached plan build must degrade to
    plain spark.sql with a loud reason, never fail the query (the
    reference's Transformed::no contract extended to engine faults)."""
    sql = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"
    want = {tuple(r) for r in spark.sql(sql).collect()}

    def boom(*a, **k):
        raise RuntimeError("injected planner fault")

    qc._plan_cached = boom
    got = qc.sql(sql)
    assert {tuple(r) for r in got.collect()} == want
    assert qc.last_decision.cached is False
    assert "engine error" in qc.last_decision.reason
    assert "injected planner fault" in qc.last_decision.reason


def test_big_state_corruption_detected_immediately(spark, tmp_path, monkeypatch):
    """Past the verify file cap, corruption must be caught on the NEXT
    read — the old 60s time-window skip could serve a part vandalized
    moments after a verification (r13 corruption-fuzz find on
    hour-bucketed state). The manifest sidecar stat-compares every file
    per verify, footer-checking only changed ones."""
    import glob
    import os

    from pyspark.sql import functions as F

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.cache import _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 5)
    ev = spark.table("events")
    cut = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0])
    cdir = str(tmp_path / "c")
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(cdir),
            default_temporal_column="ts",
            override_now_ns=cut,
        ),
    )
    # hour buckets → way past the 64-file verify cap
    sql = (
        "SELECT date_trunc('hour', ts) AS h, count(*) AS n "
        "FROM events GROUP BY 1"
    )
    qc.sql(sql).collect()
    # a verification pass happens on this hit, writing the manifest
    qc.config.override_now_ns = cut + 1
    qc.sql(sql).collect()
    files = [
        f
        for f in glob.glob(os.path.join(cdir, "**", "*.parquet"), recursive=True)
    ]
    assert len(files) > 64
    with open(files[len(files) // 2], "wb") as fh:
        fh.write(b"\x00CORRUPT")
    # IMMEDIATELY after (well inside the old 60s window): must self-heal
    qc.config.override_now_ns = cut + 2
    got = qc.sql(sql)
    rows = {tuple(r) for r in got.collect()}
    exp = {
        tuple(r)
        for r in spark.sql(
            f"SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events "
            f"WHERE ts_ns < {cut + 2} GROUP BY 1"
        ).collect()
    }
    assert rows == exp


def test_layered_verify_rechecks_only_changed_layers(spark, tmp_path, monkeypatch):
    """Per-layer digest verification (r14): layer dirs are immutable, so a
    warm refresh must footer-check ONLY its new tail layer — the r13
    entry-level manifest re-footer-checked the WHOLE state after every
    refresh (its key was the layer set), an O(full state) tail-read per
    warm query. Counted via a pq.read_metadata spy: the second refresh's
    footer reads must be far fewer than the total file count, while a
    vandalized old layer still gets caught on the next read."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.cache import _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 5)
    ev = spark.table("events")
    lo = int(ev.approxQuantile("ts_ns", [0.4], 0.0)[0])
    mid = int(ev.approxQuantile("ts_ns", [0.7], 0.0)[0])
    cdir = str(tmp_path / "c")
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(cdir),
            default_temporal_column="ts",
            override_now_ns=lo,
        ),
    )
    sql = (
        "SELECT date_trunc('hour', ts) AS h, count(*) AS n "
        "FROM events GROUP BY 1"
    )
    qc.sql(sql).collect()  # miss: base layer
    qc.config.override_now_ns = mid
    qc.sql(sql).collect()  # first warm: digests written for all layers

    calls = []
    real = pq.read_metadata

    def spy(path, *a, **k):
        calls.append(str(path))
        return real(path, *a, **k)

    monkeypatch.setattr(pq, "read_metadata", spy)
    qc.config.override_now_ns = mid + 1
    qc.sql(sql).collect()  # second warm refresh
    nfiles = len(
        glob.glob(os.path.join(cdir, "**", "*.parquet"), recursive=True)
    )
    assert nfiles > 64  # the big-state path is the one under test
    # only the refresh's OWN new layer(s) footer-check — not the base
    assert 0 < len(calls) < nfiles / 2, (len(calls), nfiles)

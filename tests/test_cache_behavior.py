"""Cache behavior integration tests (SURVEY §5.1/§5.4).

Primary oracle — metamorphic equivalence mirroring the reference demo
(``examples/demo.rs:26-50``): run cached over D1 then over D1∪D2; the run-2
result must equal plain ``spark.sql`` over D1∪D2.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set

FLAGSHIP = (
    "SELECT date_trunc('hour', ts) AS h, round(avg(value), 2) AS avg_value, "
    "count(*) AS n FROM events_split WHERE value > 1 GROUP BY 1 ORDER BY 1"
)

QUERIES = [
    FLAGSHIP,
    # no-group-by aggregation with static lower bound (README.md:129)
    "SELECT round(avg(value), 2) AS a, count(*) AS n, min(value) AS mn, "
    "max(value) AS mx FROM events_split WHERE ts > '2024-01-03'",
    # group by plain column + temporal bucket
    "SELECT event_type, date_trunc('day', ts) AS d, sum(value) AS s, "
    "count(value) AS c FROM events_split GROUP BY 1, 2",
    # global aggregate, no filter
    "SELECT count(*) AS n, sum(value) AS s FROM events_split",
    # variance family
    "SELECT event_type, round(var_samp(value), 6) AS v, "
    "round(stddev_pop(value), 6) AS sp FROM events_split GROUP BY 1",
    # exact median/percentile via the RLE-histogram state
    "SELECT event_type, round(median(value), 6) AS med, "
    "round(percentile(value, 0.25), 6) AS p25 FROM events_split GROUP BY 1",
    # exact distinct count via the set state (union merge, size finalize)
    "SELECT event_type, count(DISTINCT user_id) AS du, count(*) AS n "
    "FROM events_split GROUP BY 1",
]


@pytest.fixture()
def split_views(spark):
    """events_split view: first registered as the early half (run 1), then
    swapped to the full table (run 2) — the reference demo's two-table trick
    (``examples/demo.rs:17-37``)."""
    ev = spark.table("events")
    # integer µs math: the run-1 cut literal and the watermark must agree
    # exactly or the boundary row double-counts (see __spark_entry__._qc_two_run)
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)

    def run1():
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events_split")

    def run2():
        ev.createOrReplaceTempView("events_split")

    yield run1, run2, cut_ns
    spark.catalog.dropTempView("events_split")


@pytest.mark.parametrize("sql", QUERIES)
def test_metamorphic_equivalence(spark, qc, split_views, sql):
    run1, run2, cut_ns = split_views

    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()  # run 1: populates the cache over D1
    assert qc.last_decision.cached and not qc.last_decision.cache_hit

    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    expect = spark.sql(sql)
    assert rows_set(got) == rows_set(expect)


def test_refresh_scans_only_new_rows(spark, qc, split_views):
    """Perf smoke (BASELINE cache-efficacy target): warm run-2 input rows ≈
    rows since watermark ≪ full table."""
    run1, run2, cut_ns = split_views
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(FLAGSHIP).collect()
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    qc.sql(FLAGSHIP).collect()
    fresh = qc.last_decision.fresh_rows()
    total = spark.table("events_split").count()
    if fresh is not None:
        assert fresh < total * 0.75


def test_cache_miss_then_hit_logged(qc, spark, split_views):
    run1, run2, cut_ns = split_views
    run2()
    qc.config.override_now_ns = cut_ns
    qc.sql(FLAGSHIP).collect()
    qc.sql(FLAGSHIP).collect()
    msgs = qc.config.log.messages()
    assert any("cache miss" in m for m in msgs)
    assert any("cache hit" in m for m in msgs)


def test_fingerprint_distinguishes_literals(qc, spark, split_views):
    run1, run2, cut_ns = split_views
    run2()
    qc.config.override_now_ns = cut_ns
    qc.sql("SELECT count(*) AS n FROM events_split WHERE value > 1").collect()
    qc.sql("SELECT count(*) AS n FROM events_split WHERE value > 2").collect()
    # second query must be a MISS (different literal ⇒ different fingerprint,
    # SURVEY §4.4.3)
    assert not qc.last_decision.cache_hit


def test_fingerprint_stable_across_spellings(qc, spark, split_views):
    run1, run2, cut_ns = split_views
    run2()
    qc.config.override_now_ns = cut_ns
    qc.sql("SELECT count(*) AS n FROM events_split WHERE value > 1").collect()
    qc.sql("select COUNT(*) as n from events_split where value > 1").collect()
    assert qc.last_decision.cache_hit


def test_passthrough_keeps_full_sql_surface(qc, spark):
    # non-cacheable queries still run — the full Spark SQL surface
    df = qc.sql(
        "SELECT e.event_type, count(*) AS n FROM events e "
        "JOIN events e2 ON e.event_id = e2.event_id GROUP BY 1"
    )
    assert not qc.last_decision.cached
    assert df.count() > 0


def test_dynamic_lower_bound_now_cached(qc, spark):
    # beyond-reference: dynamic bounds are planned (see test_dynamic_bounds);
    # with the real clock (2026+) the 100-day window contains no 2024 events
    df = qc.sql("SELECT count(*) AS n FROM events WHERE ts > now() - INTERVAL 100 DAY")
    assert qc.last_decision.cached
    assert df.collect()[0]["n"] == 0


def test_now_in_non_bound_position_passthrough(qc, spark):
    df = qc.sql("SELECT count(*) AS n FROM events WHERE value > 1 OR ts > now()")
    assert not qc.last_decision.cached
    assert df.collect()[0]["n"] > 0


def test_exact_distinct_cached_single_arg_only(qc, spark):
    # single-arg count(DISTINCT) caches via the set state…
    df = qc.sql("SELECT count(DISTINCT user_id) AS u FROM events")
    assert qc.last_decision.cached
    assert df.collect()[0]["u"] > 0
    # …and distinct TUPLE counting caches on a struct set state (r13)
    df2 = qc.sql(
        "SELECT count(DISTINCT user_id, event_type) AS u FROM events"
    )
    assert qc.last_decision.cached
    assert df2.collect()[0]["u"] > 0
    # sum/avg(DISTINCT plain col) cache on the same set state since r10…
    qc.sql("SELECT sum(DISTINCT value) AS s FROM events").collect()
    assert qc.last_decision.cached
    qc.sql("SELECT avg(DISTINCT value) AS a FROM events").collect()
    assert qc.last_decision.cached
    # …but computed-expression args remain non-decomposable (the output
    # type is not knowable driver-side)
    qc.sql("SELECT sum(DISTINCT value * 2) AS s FROM events").collect()
    assert not qc.last_decision.cached


def test_memory_cache_roundtrip(qc_mem, spark, split_views):
    run1, run2, cut_ns = split_views
    run1()
    qc_mem.config.override_now_ns = cut_ns
    sql = FLAGSHIP
    qc_mem.sql(sql).collect()
    run2()
    qc_mem.config.override_now_ns = cut_ns + 10**17
    got = qc_mem.sql(sql)
    assert qc_mem.last_decision.cache_hit
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_fingerprint_stable_under_conjunct_reorder(qc, spark, split_views):
    # canon_predicate sorts AND conjuncts: reordered WHERE hits the same entry
    run1, run2, cut_ns = split_views
    run2()
    qc.config.override_now_ns = cut_ns
    qc.sql(
        "SELECT count(*) AS n FROM events_split "
        "WHERE value > 1 AND event_type = 'click'"
    ).collect()
    qc.sql(
        "SELECT count(*) AS n FROM events_split "
        "WHERE event_type = 'click' AND value > 1"
    ).collect()
    assert qc.last_decision.cache_hit


def test_hot_read_skips_scan_and_store(spark, qc, split_views):
    """now <= watermark → the refresh window is provably empty: serve from
    state with no scan and no store-back."""
    import glob
    import os

    run1, run2, cut_ns = split_views
    run2()
    qc.config.override_now_ns = cut_ns
    qc.sql(FLAGSHIP).collect()
    state_dirs = glob.glob(str(qc.config.cache.root) + "/*/state-*")
    # same now (not advanced): hot read
    got = qc.sql(FLAGSHIP)
    assert qc.last_decision.cache_hit
    assert qc.last_decision.observation is None  # no fresh scan happened
    assert glob.glob(str(qc.config.cache.root) + "/*/state-*") == state_dirs
    assert any(
        "fresh window empty" in m or "result memo" in m
        for m in qc.config.log.messages()
    )
    # correctness: as-of now=cut ≡ plain query over the pre-cut slice
    run1()
    assert rows_set(got) == rows_set(spark.sql(FLAGSHIP))
    run2()


@pytest.mark.parametrize(
    "gsql",
    [
        # ROLLUP over two keys
        "SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n, "
        "round(sum(value), 2) AS s FROM events_split "
        "GROUP BY ROLLUP (event_type, d)",
        # CUBE
        "SELECT event_type, count(*) AS n FROM events_split "
        "GROUP BY CUBE (event_type)",
        # explicit GROUPING SETS
        "SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n "
        "FROM events_split GROUP BY GROUPING SETS ((event_type), (d), ())",
    ],
)
def test_grouping_sets_cached(spark, qc, split_views, gsql):
    """ROLLUP/CUBE/GROUPING SETS: finest-granularity state re-aggregated per
    set must equal Spark's native grouping-set output, incrementally."""
    run1, run2, cut_ns = split_views
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(gsql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(gsql)
    assert qc.last_decision.cache_hit
    assert rows_set(got) == rows_set(spark.sql(gsql))


def test_grouping_flags_reconstructed(spark, qc, split_views):
    """grouping()/grouping_id() emitted as per-set literals must match
    Spark's native flags, incrementally."""
    run1, run2, cut_ns = split_views
    gsql = (
        "SELECT event_type, date_trunc('day', ts) AS d, "
        "grouping(event_type) AS ge, "
        "grouping_id(event_type, date_trunc('day', ts)) AS gid, "
        "count(*) AS n FROM events_split "
        "GROUP BY ROLLUP (event_type, date_trunc('day', ts))"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(gsql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(gsql)
    assert qc.last_decision.cache_hit
    assert rows_set(got) == rows_set(spark.sql(gsql))
    assert dict(got.dtypes)["ge"] == "tinyint"
    assert dict(got.dtypes)["gid"] == "bigint"


def test_grouping_without_sets_passthrough(qc, spark):
    # invalid SQL in Spark too: the passthrough surfaces Spark's own error
    import pytest as _pt
    from pyspark.errors.exceptions.captured import AnalysisException

    with _pt.raises(AnalysisException):
        qc.sql(
            "SELECT event_type, grouping(event_type) AS g, count(*) AS n "
            "FROM events GROUP BY event_type"
        ).collect()


def test_median_state_compacted(spark, qc, split_views):
    """Stored percentile state is compacted to O(distinct values) per group
    at store time (cache.py _compact_hist_*), across miss + warm refresh."""
    run1, run2, cut_ns = split_views
    sql = "SELECT event_type, median(value) AS med FROM events_split GROUP BY 1"
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = {r["event_type"]: r["med"] for r in qc.sql(sql).collect()}
    want = {
        r["event_type"]: r["med"]
        for r in spark.sql(sql).collect()
    }
    assert got == want
    dmax = (
        spark.table("events_split")
        .groupBy("event_type")
        .agg(F.countDistinct("value").alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
    )
    checked = 0
    for info in qc.config.cache.entries():
        st = qc.config.cache.entry(info.fingerprint).get(spark)
        hist_cols = [c for c in st.columns if c.endswith("_hist")]
        assert hist_cols, "median state column missing"
        row = st.select(
            *[F.max(F.size(c)).alias(c) for c in hist_cols]
        ).collect()[0]
        for c in hist_cols:
            assert row[c] <= dmax
        checked += 1
    assert checked == 1


def test_percentile_state_cardinality_cap(spark, tmp_path, split_views):
    """VERDICT r2 item 7: a high-cardinality continuous column trips
    config.percentile_max_distinct at store time — the engine bails to
    passthrough (correct results, no runaway state) and stays passthrough
    for that fingerprint."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    run1, run2, cut_ns = split_views
    run1()
    # `value` is continuous — hundreds of distinct doubles per event_type;
    # a cap of 5 must trip immediately
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-capped")),
        default_temporal_column="ts",
        override_now_ns=cut_ns,
        percentile_max_distinct=5,
    )
    qc = CachedSparkSession(spark, cfg)
    sql = (
        "SELECT event_type, round(median(value), 6) AS med, count(*) AS n "
        "FROM events_split GROUP BY 1 ORDER BY 1"
    )
    r1 = qc.sql(sql)
    assert not qc.last_decision.cached
    assert "percentile_max_distinct" in (qc.last_decision.reason or "")
    assert sorted(map(tuple, r1.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )
    # no state was stored for the tripped fingerprint
    assert all(i.rows for i in cfg.cache.entries()) or not cfg.cache.entries()
    # run 2: short-circuits to passthrough without redoing the state build
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    r2 = qc.sql(sql)
    assert not qc.last_decision.cached
    assert sorted(map(tuple, r2.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )
    # an ample cap on a fresh session caches the same query fine
    cfg2 = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-ample")),
        default_temporal_column="ts",
        override_now_ns=cut_ns + 10**17,
        percentile_max_distinct=100_000,
    )
    qc2 = CachedSparkSession(spark, cfg2)
    r3 = qc2.sql(sql)
    assert qc2.last_decision.cached
    assert sorted(map(tuple, r3.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )


def test_count_distinct_state_cardinality_cap(spark, tmp_path, split_views):
    """r4/r5 ADVICE: exact count(DISTINCT x) set state is O(distinct)/group;
    a high-cardinality column must trip config.distinct_max_values at store
    time and degrade to passthrough (correct results, no runaway state),
    staying passthrough for that fingerprint. An ample cap still caches."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    run1, run2, cut_ns = split_views
    run1()
    # event_id is unique per row — thousands of distinct values per group;
    # a cap of 5 must trip on the first store
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-dcap")),
        default_temporal_column="ts",
        override_now_ns=cut_ns,
        distinct_max_values=5,
    )
    qc = CachedSparkSession(spark, cfg)
    sql = (
        "SELECT event_type, count(DISTINCT event_id) AS u, count(*) AS n "
        "FROM events_split GROUP BY 1 ORDER BY 1"
    )
    r1 = qc.sql(sql)
    assert not qc.last_decision.cached
    assert "distinct_max_values" in (qc.last_decision.reason or "")
    assert sorted(map(tuple, r1.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )
    # run 2: short-circuits to passthrough without redoing the state build
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    r2 = qc.sql(sql)
    assert not qc.last_decision.cached
    assert "distinct_max_values" in (qc.last_decision.reason or "")
    assert sorted(map(tuple, r2.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )
    # an ample cap on a fresh session caches and refreshes the same query
    cfg2 = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-dample")),
        default_temporal_column="ts",
        override_now_ns=cut_ns + 10**17,
        distinct_max_values=1_000_000,
    )
    qc2 = CachedSparkSession(spark, cfg2)
    r3 = qc2.sql(sql)
    assert qc2.last_decision.cached
    assert sorted(map(tuple, r3.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )


def test_hll_sketch_merges_across_refreshes(spark, qc, split_views):
    """VERDICT r2 item 9: approx_count_distinct state is an HLL sketch;
    union-merging run-1 state with the fresh tail must give EXACTLY the
    estimate the sketch of the whole table gives (sketch union is the
    deterministic merge of the same algebra — not an approximation of an
    approximation)."""
    run1, run2, cut_ns = split_views
    sql = (
        "SELECT event_type, approx_count_distinct(user_id) AS u, "
        "count(*) AS n FROM events_split GROUP BY 1 ORDER BY 1"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()
    assert qc.last_decision.cached and not qc.last_decision.cache_hit
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = sorted(map(tuple, qc.sql(sql).collect()))
    assert qc.last_decision.cache_hit
    want = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want


def test_data_watermark_mode_survives_late_arrival(spark, tmp_path, split_views):
    """SURVEY §7 hard-part 3: with watermark_mode='data' the stored
    watermark is max(ts)+1 over rows actually seen, so data that ARRIVES
    late (run 1 executed with a far-future now) is still folded in on the
    next refresh. 'now' mode would silently drop it — that is the
    documented contract difference this test pins down."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    run1, run2, cut_ns = split_views
    far_future = cut_ns + 10**18
    sql = (
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS s "
        "FROM events_split GROUP BY 1 ORDER BY 1"
    )
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-dwm")),
        default_temporal_column="ts",
        override_now_ns=far_future,  # clock far ahead of the data
        watermark_mode="data",
    )
    qc = CachedSparkSession(spark, cfg)
    run1()  # only the early half "has arrived"
    qc.sql(sql).collect()
    assert qc.last_decision.cached and not qc.last_decision.cache_hit
    ent = cfg.cache.entry(qc.last_decision.fingerprint)
    assert ent.watermark_ns < cut_ns + 10**12  # data-derived, not far_future

    run2()  # the second half arrives late — all of it before far_future
    qc.config.override_now_ns = far_future + 10**12
    got = sorted(map(tuple, qc.sql(sql).collect()))
    assert qc.last_decision.cache_hit
    want = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want  # late rows folded in; 'now' mode would have lost them


def test_data_watermark_mode_filter_path(spark, tmp_path, split_views):
    """Same contract on the filter row-set cache."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    run1, run2, cut_ns = split_views
    far_future = cut_ns + 10**18
    sql = "SELECT event_id, event_type, value FROM events_split WHERE value > 100"
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-dwm-f")),
        default_temporal_column="ts",
        override_now_ns=far_future,
        watermark_mode="data",
    )
    qc = CachedSparkSession(spark, cfg)
    run1()
    qc.sql(sql).collect()
    run2()
    qc.config.override_now_ns = far_future + 10**12
    got = sorted(map(tuple, qc.sql(sql).collect()))
    assert qc.last_decision.cache_hit
    want = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want


def test_data_watermark_scan_bounded_by_stored_watermark(spark, tmp_path, split_views):
    """ADVICE r3 (medium): in watermark_mode='data' the max-ts collect and
    the store scan are separate Spark jobs. The store scan must be upper-
    bounded by the STORED watermark (max+1), not by now — otherwise a row
    landing between the two jobs with event time above the collected max is
    folded into state while the watermark stays below it, and the next
    refresh re-merges it forever (double count). This pins the consistency
    invariant: scan hi == stored watermark, visible in the refresh plan."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    run1, run2, cut_ns = split_views
    far_future = cut_ns + 10**18
    sql = (
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS s "
        "FROM events_split GROUP BY 1 ORDER BY 1"
    )
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc-dwm-b")),
        default_temporal_column="ts",
        override_now_ns=far_future,
        watermark_mode="data",
    )
    qc = CachedSparkSession(spark, cfg)
    run1()
    qc.sql(sql).collect()
    ent = cfg.cache.entry(qc.last_decision.fingerprint)
    wm1 = ent.watermark_ns
    # miss path: scan bounded by the data watermark, not far_future
    plan1 = qc.last_refresh_df._jdf.queryExecution().optimizedPlan().toString()
    assert str(wm1) in plan1, "store scan not bounded by the stored watermark"
    assert str(far_future) not in plan1, "store scan still bounded by now"

    run2()
    qc.config.override_now_ns = far_future + 10**12
    qc.sql(sql).collect()
    assert qc.last_decision.cache_hit
    ent2 = cfg.cache.entry(qc.last_decision.fingerprint)
    wm2 = ent2.watermark_ns
    plan2 = qc.last_refresh_df._jdf.queryExecution().optimizedPlan().toString()
    assert wm2 > wm1
    assert str(wm2) in plan2, "refresh scan not bounded by the stored watermark"
    assert str(far_future + 10**12) not in plan2


def test_parquet_cache_vacuum(spark, tmp_path, split_views):
    """ParquetQueryCache.vacuum() deletes orphan state dirs and stale meta
    tmps past the grace period; live state and young dirs survive."""
    import os
    import time

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    run1, run2, cut_ns = split_views
    run1()
    cache = ParquetQueryCache(str(tmp_path / "qc-vac"))
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=cache, default_temporal_column="ts", override_now_ns=cut_ns
        ),
    )
    sql = "SELECT event_type, count(*) AS n FROM events_split GROUP BY 1 ORDER BY 1"
    qc.sql(sql).collect()
    fp_dirs = [d for d in os.listdir(cache.root) if os.path.isdir(os.path.join(cache.root, d))]
    assert fp_dirs
    fp_dir = os.path.join(cache.root, fp_dirs[0])

    orphan = os.path.join(fp_dir, "state-deadbeefcafe")
    os.makedirs(orphan)
    tmp_meta = os.path.join(fp_dir, ".meta-deadbeef.tmp")
    open(tmp_meta, "w").write("{}")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    os.utime(tmp_meta, (old, old))
    young = os.path.join(fp_dir, "state-aaaaaaaaaaaa")
    os.makedirs(young)

    removed = cache.vacuum(grace_s=3600)
    assert sorted(os.path.basename(p) for p in removed) == [
        ".meta-deadbeef.tmp", "state-deadbeefcafe",
    ]
    assert os.path.exists(young)
    # live state untouched: warm refresh still serves and matches plain
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, spark.sql(sql).collect())
    )


def test_regressed_now_serves_as_of_watermark(spark, qc):
    """override_now_ns BELOW the stored watermark (replay knob; wall
    clocks are monotone) is a hot read as-of the WATERMARK — the cache
    never time-travels backwards, and never scans. Reference parity,
    refined: its cached reads are always as-of store time (no upper
    bound at all); ours are as-of max(now, watermark)."""
    import datetime as dt

    from pyspark.sql import functions as F

    mx = int(spark.table("events").agg(F.max("ts_ns")).collect()[0][0])
    day = 24 * 3600 * 10**9
    sql = "SELECT count(*) AS n, round(sum(value), 2) AS s FROM events"
    qc.config.override_now_ns = mx - 2 * day
    qc.sql(sql).collect()
    qc.config.override_now_ns = mx
    as_of_mx = {tuple(r) for r in qc.sql(sql).collect()}
    wm = qc.last_decision.watermark_ns

    qc.config.override_now_ns = mx - 5 * day  # regress below the watermark
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    assert {tuple(r) for r in got.collect()} == as_of_mx
    lit_dt = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=mx // 1000)
    plain = spark.sql(
        sql.replace(
            "FROM events",
            f"FROM events WHERE ts < TIMESTAMP '{lit_dt.isoformat(sep=' ')}'",
        )
    )
    assert {tuple(r) for r in plain.collect()} == as_of_mx


def test_grouping_sets_share_finest_entry(spark, qc_mem):
    """ROLLUP, CUBE, GROUPING SETS, and the plain finest GROUP BY all ride
    ONE finest-granularity entry: the first populates, the rest hit (each
    grouping set is a re-aggregation of the same state — merge
    associativity)."""
    qc_mem.config.override_now_ns = None
    base = (
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS n FROM events "
    )
    qc_mem.sql(base + "GROUP BY ROLLUP (1, 2)").count()
    d0 = qc_mem.last_decision
    assert d0.cached and not d0.cache_hit
    for tail in (
        "GROUP BY CUBE (1, 2)",
        "GROUP BY GROUPING SETS ((1), (2), (1, 2))",
        "GROUP BY 1, 2",
    ):
        qc_mem.sql(base + tail).count()
        d = qc_mem.last_decision
        assert d.cached and d.cache_hit, (tail, d.reason)
        assert d.fingerprint == d0.fingerprint, tail


def test_cube_on_lineitem_cached_two_run(spark, tmp_path):
    """pt_cube's exact query shape through the CACHED path: CUBE over
    lineitem with l_shipdate configured as the temporal column, two-run
    incremental, result ≡ plain Spark (VERDICT r11 item 3)."""
    import datetime as dt

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    cut = dt.datetime(1997, 1, 1)
    cut_ns = int(cut.replace(tzinfo=dt.timezone.utc).timestamp()) * 10**9
    li = spark.table("lineitem")
    qc2 = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "cube")),
            default_temporal_column="ts",
            extra_temporal_columns=frozenset({"l_shipdate"}),
            override_now_ns=cut_ns,
        ),
    )
    sql = (
        "SELECT l_returnflag AS rf, l_linestatus AS ls, count(*) AS n, "
        "round(sum(l_quantity), 2) AS sq FROM lineitem_c "
        "GROUP BY CUBE (l_returnflag, l_linestatus) "
        "ORDER BY rf NULLS FIRST, ls NULLS FIRST"
    )
    li.filter(F.col("l_shipdate") < F.lit(cut)).createOrReplaceTempView(
        "lineitem_c"
    )
    qc2.sql(sql).collect()
    assert qc2.last_decision.cached, qc2.last_decision.reason
    li.createOrReplaceTempView("lineitem_c")
    qc2.config.override_now_ns = cut_ns + 10**18
    got = qc2.sql(sql)
    assert qc2.last_decision.cache_hit, qc2.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))
    spark.catalog.dropTempView("lineitem_c")

"""Cache backend behavior: adaptive put paths, multi-temporal config,
source format helpers."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


def test_put_falls_back_to_distributed_write(spark, tmp_path, monkeypatch):
    """State above the driver-collect cap must take the distributed write
    path and still round-trip correctly."""
    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 10)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-big")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    stored = entry.put(123, df, spark)
    assert stored.count() == 1000
    # second put sees rows=None→... meta rows recorded as None on spill;
    # re-open entry and read back
    e2 = cache.entry("fp-big")
    assert e2.occupied and e2.watermark_ns == 123
    assert e2.get(spark).count() == 1000


def test_put_driver_path_small_state(spark, tmp_path):
    from datafusion_query_cache_spark.cache import ParquetQueryCache

    cache = ParquetQueryCache(str(tmp_path / "c2"))
    entry = cache.entry("fp-small")
    df = spark.range(5).select(F.col("id"), (F.col("id") * 1.5).alias("v"))
    stored = entry.put(7, df, spark)
    assert rows_set(stored) == rows_set(df)
    # driver path records the row count in meta
    e2 = cache.entry("fp-small")
    assert e2._meta.get("rows") == 5
    assert rows_set(e2.get(spark)) == rows_set(df)


def test_extra_temporal_columns(spark, tmp_path):
    """A second temporal column via config: lineitem cached on l_shipdate."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    cut = dt.datetime(2000, 1, 1)
    cut_ns = int(cut.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
    li = spark.table("lineitem")
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "li")),
            default_temporal_column="ts",
            extra_temporal_columns=frozenset({"l_shipdate"}),
            override_now_ns=cut_ns,
        ),
    )
    sql = (
        "SELECT l_returnflag, date_trunc('month', l_shipdate) AS m, "
        "count(*) AS n FROM lineitem_t GROUP BY 1, 2"
    )
    li.filter(F.col("l_shipdate") < F.lit(cut)).createOrReplaceTempView("lineitem_t")
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    li.createOrReplaceTempView("lineitem_t")
    qc.config.override_now_ns = cut_ns + 10**18
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    assert rows_set(got) == rows_set(spark.sql(sql))
    spark.catalog.dropTempView("lineitem_t")


def test_format_helpers(spark, tmp_path):
    from datafusion_query_cache_spark.sources.formats import (
        register_csv,
        register_json,
        write_partitioned_parquet,
    )

    p = tmp_path / "t.csv"
    p.write_text("id,v\n1,2.5\n2,3.5\n")
    register_csv(spark, "csv_fmt_t", str(p))
    assert spark.sql("SELECT sum(v) AS s FROM csv_fmt_t").collect()[0]["s"] == 6.0

    j = tmp_path / "t.jsonl"
    j.write_text('{"id":1}\n{"id":2}\n{"id":3}\n')
    register_json(spark, "json_fmt_t", str(j))
    assert spark.sql("SELECT count(*) AS n FROM json_fmt_t").collect()[0]["n"] == 3

    src = spark.range(100).withColumn("part", F.col("id") % 4)
    write_partitioned_parquet(src, str(tmp_path / "pp"), ["part"])
    back = spark.read.parquet(str(tmp_path / "pp"))
    assert back.filter(F.col("part") == 2).count() == 25


def test_cache_entries_and_clear(spark, tmp_path):
    from datafusion_query_cache_spark.cache import ParquetQueryCache

    cache = ParquetQueryCache(str(tmp_path / "inv"))
    d1 = spark.range(3).select(F.col("id"))
    cache.entry("fp-a").put(1, d1, spark)
    cache.entry("fp-b").put(2, d1, spark)
    infos = cache.entries()
    assert {i.fingerprint for i in infos} == {"fp-a", "fp-b"}
    assert all(i.watermark_ns in (1, 2) for i in infos)
    # age-based clear with a future cutoff removes nothing
    assert cache.clear(older_than_seconds=3600) == 0
    # full clear removes both; entries self-heal as vacant
    assert cache.clear() == 2
    assert not cache.entry("fp-a").occupied


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Co-located bucketed tables join with ZERO exchanges — the recurring
    big-join answer at scale (sources/bucketing.py)."""
    import os

    from datafusion_query_cache_spark.sources.bucketing import (
        colocated_join,
        write_bucketed,
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("lineitem").select("l_orderkey", "l_quantity")
        od = spark.table("orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "bk_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
        write_bucketed(
            od.withColumnRenamed("o_orderkey", "l_orderkey"),
            "bk_orders",
            ["l_orderkey"],
            8,
            ["l_orderkey"],
        )
        j = colocated_join(spark, "bk_lineitem", "bk_orders", ["l_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan[:400]
        assert j.count() == spark.table("lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")
        spark.sql("DROP TABLE IF EXISTS bk_orders")


def test_bucketed_write_self_heals_stale_location(spark):
    """A killed prior write leaves catalog-less residue (a `_temporary`
    dir) at the managed location; `write_bucketed` must clear it and
    succeed — and the test session's warehouse must live OUTSIDE the
    repo so residue never lands in the working tree (VERDICT r7/r8)."""
    import os
    from urllib.parse import urlparse

    from datafusion_query_cache_spark.sources.bucketing import (
        colocated_join,
        write_bucketed,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh_path = urlparse(wh).path or wh
    assert "/root/repo" not in os.path.abspath(wh_path)

    # pre-seed stale residue where the managed table will live
    tloc = os.path.join(wh_path, "bk_heal")
    os.makedirs(os.path.join(tloc, "_temporary", "0"), exist_ok=True)
    with open(os.path.join(tloc, "part-stale.parquet"), "wb") as f:
        f.write(b"not parquet")
    spark.sql("DROP TABLE IF EXISTS bk_heal")  # residue, no catalog entry

    try:
        li = spark.table("lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(li, "bk_heal", ["l_orderkey"], 4, ["l_orderkey"])
        assert spark.table("bk_heal").count() == li.count()
        assert not os.path.exists(os.path.join(tloc, "_temporary"))
        assert not os.path.exists(os.path.join(tloc, "part-stale.parquet"))
        # overwrite over a LIVE entry heals/replaces cleanly too
        write_bucketed(
            li.limit(10), "bk_heal", ["l_orderkey"], 4, ["l_orderkey"]
        )
        assert spark.table("bk_heal").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_heal")


def test_dense_arrow_interior_empty_chunk(spark):
    """PySpark 4.x createDataFrame stops converting at an INTERIOR empty
    record batch, silently truncating later rows (r9 fuzzer find);
    dense_arrow must make any such table convert losslessly."""
    import pyarrow as pa

    from datafusion_query_cache_spark.cache import dense_arrow

    t1 = pa.table({"a": pa.array(range(5), pa.int64())})
    e = pa.table({"a": pa.array([], pa.int64())})
    t2 = pa.table({"a": pa.array(range(5, 8), pa.int64())})
    cat = pa.concat_tables([t1, e, t2])
    assert cat.num_rows == 8
    # (documents the defect this guards against: raw conversion drops rows)
    assert spark.createDataFrame(dense_arrow(cat)).count() == 8
    # no-op on already-dense and on fully-empty tables
    assert dense_arrow(t1) is t1
    assert dense_arrow(e).num_rows == 0


def test_dense_arrow_non_first_column_chunking(spark):
    """A zero-length chunk living only in a NON-first column still makes
    to_batches() emit an interior empty batch; the guard must compare
    filtered-vs-unfiltered BATCH counts, not column(0).num_chunks (r9
    ADVICE — with col0 at 2 chunks and col1 at [5],[0],[3] the old
    chunk-count compare returned the table undensified)."""
    import pyarrow as pa

    from datafusion_query_cache_spark.cache import dense_arrow

    c0 = pa.chunked_array(
        [pa.array(range(5), pa.int64()), pa.array(range(5, 8), pa.int64())]
    )
    c1 = pa.chunked_array(
        [
            pa.array(range(5), pa.int64()),
            pa.array([], pa.int64()),
            pa.array(range(3), pa.int64()),
        ]
    )
    t = pa.Table.from_arrays([c0, c1], names=["a", "b"])
    assert [b.num_rows for b in t.to_batches()] == [5, 0, 3]
    d = dense_arrow(t)
    assert all(b.num_rows for b in d.to_batches())
    assert spark.createDataFrame(d).count() == 8


def test_memory_entry_get_arrow_is_dense(spark, qc_mem):
    """MemoryEntry.get_arrow must densify at the source: a stored state
    table carrying an interior empty chunk (e.g. concatenated upstream)
    must reach createDataFrame consumers losslessly (r9 verdict item 2)."""
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    from datafusion_query_cache_spark.cache import MemoryQueryCache

    cache = MemoryQueryCache()
    entry = cache.entry("fp-dense-test")
    t1 = pa.table({"g": pa.array([1, 2], pa.int64())})
    e = pa.table({"g": pa.array([], pa.int64())})
    t2 = pa.table({"g": pa.array([3, 4, 5], pa.int64())})
    chunked = pa.concat_tables([t1, e, t2])
    schema = StructType([StructField("g", LongType())])
    cache._store["fp-dense-test"] = (0, chunked, schema)
    got = entry.get_arrow()
    assert got.num_rows == 5
    assert all(b.num_rows for b in got.to_batches())
    assert spark.createDataFrame(got).count() == 5


def test_memory_rowset_zero_row_refresh_then_rows(spark, qc_mem):
    """A zero-row refresh window between two row-adding refreshes must not
    lose the later rows: the empty append used to store an interior empty
    chunk that truncated every later createDataFrame of the row set."""
    import datetime as dt

    from pyspark.sql import functions as F

    mx = int(spark.table("events").agg(F.max("ts_ns")).collect()[0][0])
    day = 24 * 3600 * 10**9
    base = mx - 5 * day
    # window 1→2 is ~0.4 s: virtually always zero fresh rows
    pts = [base, base + day, base + day + 4 * 10**8, ((base // day) + 3) * day]
    sql = "SELECT event_id, event_type, value FROM events WHERE value > 50"
    qc_mem.config.default_temporal_column = "ts"
    for now in pts:
        qc_mem.config.override_now_ns = now
        got = sorted(tuple(r) for r in qc_mem.sql(sql).collect())
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        lit_dt = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=now // 1000)
        lit = f"TIMESTAMP '{lit_dt.isoformat(sep=' ')}'"
        want = sorted(
            tuple(r)
            for r in spark.sql(
                sql.replace("WHERE ", f"WHERE ts < {lit} AND ", 1)
            ).collect()
        )
        assert got == want, f"at now={now}: {len(got)} vs {len(want)} rows"


def test_memory_cache_lru_eviction(spark):
    """max_entries LRU (r9 verdict item 3): least-recently-USED entry
    evicts on overflow; reads refresh recency."""
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    from datafusion_query_cache_spark.cache import MemoryQueryCache

    cache = MemoryQueryCache(max_entries=2)
    sch = StructType([StructField("g", LongType())])
    t = pa.table({"g": pa.array([1], pa.int64())})
    cache.entry("fp-a").put_arrow(1, t, sch)
    cache.entry("fp-b").put_arrow(1, t, sch)
    assert cache.entry("fp-a").get_arrow() is not None  # a is now MRU
    cache.entry("fp-c").put_arrow(1, t, sch)  # overflow: b (LRU) evicts
    assert len(cache) == 2
    assert cache.entry("fp-b").occupied is False
    assert cache.entry("fp-a").occupied and cache.entry("fp-c").occupied
    # overwrite refreshes recency too
    cache.entry("fp-a").put_arrow(2, t, sch)
    cache.entry("fp-d").put_arrow(1, t, sch)
    assert cache.entry("fp-c").occupied is False
    assert cache.entry("fp-a").occupied and cache.entry("fp-d").occupied


def _backdate_entry(root, keep_fp, seconds):
    """Shift an entry dir's meta/.accessed mtimes into the past."""
    import time as _t

    for d in os.listdir(root):
        full = os.path.join(root, d)
        if not os.path.isdir(full):
            continue
        with open(os.path.join(full, "meta.json")) as f:
            import json as _json

            fp = _json.load(f).get("fingerprint", "")
        if keep_fp(fp):
            continue
        past = _t.time() - seconds
        for name in ("meta.json", ".accessed"):
            p = os.path.join(full, name)
            if os.path.exists(p):
                os.utime(p, (past, past))


def test_parquet_cache_ttl_sweep_and_self_heal(spark, tmp_path):
    """TTL sweep (r9 verdict item 3): an expired entry's whole fingerprint
    dir evicts; the next query self-heals as a cold miss with correct
    results."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    cache = ParquetQueryCache(str(tmp_path / "c"), ttl_s=3600.0)
    qc = CachedSparkSession(spark, QueryCacheConfig(cache=cache))
    sql = (
        "SELECT event_type, count(*) AS n, round(sum(value) + 1e-9, 2) AS s "
        "FROM events GROUP BY event_type"
    )
    want = rows_set(qc.sql(sql))
    assert qc.last_decision.cached
    assert len(cache.entries()) == 1
    _backdate_entry(cache.root, keep_fp=lambda fp: False, seconds=7200)
    removed = cache.sweep()
    assert len(removed) == 1 and len(cache.entries()) == 0
    got = qc.sql(sql)  # self-heals as a plain miss: recompute + store
    assert rows_set(got) == want
    assert qc.last_decision.cached
    assert len(cache.entries()) == 1


def test_parquet_cache_byte_budget_evicts_lru_first(spark, tmp_path):
    """Byte-budget sweep: past the budget, least-recently-accessed entries
    evict first; recently-touched entries survive."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    cache = ParquetQueryCache(str(tmp_path / "c"))
    qc = CachedSparkSession(spark, QueryCacheConfig(cache=cache))
    old_sql = "SELECT count(*) AS n FROM events"
    new_sql = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    qc.sql(old_sql).collect()
    qc.sql(new_sql).collect()
    assert len(cache.entries()) == 2
    fresh_fp = qc.last_decision.fingerprint
    _backdate_entry(cache.root, keep_fp=lambda fp: fp == fresh_fp, seconds=7200)
    removed = cache.sweep(max_bytes=1)  # both over budget: oldest goes first
    # budget=1 can never be satisfied, so both evict — oldest first
    assert len(removed) == 2
    cache2 = ParquetQueryCache(str(tmp_path / "c2"))
    qc2 = CachedSparkSession(spark, QueryCacheConfig(cache=cache2))
    qc2.sql(old_sql).collect()
    qc2.sql(new_sql).collect()
    fresh_fp2 = qc2.last_decision.fingerprint
    _backdate_entry(cache2.root, keep_fp=lambda fp: fp == fresh_fp2, seconds=7200)
    sizes = {}
    for d in os.listdir(cache2.root):
        full = os.path.join(cache2.root, d)
        if os.path.isdir(full):
            sizes[d] = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _dd, fs in os.walk(full)
                for f in fs
            )
    # budget that ONE entry fits but two don't: only the stale one evicts
    budget = max(sizes.values()) + 1
    removed = cache2.sweep(max_bytes=budget)
    assert len(removed) == 1
    left = cache2.entries()
    assert len(left) == 1 and left[0].fingerprint == fresh_fp2


def test_aggregate_state_corruption_self_heals_hot_read(spark, tmp_path):
    """Aggregate twin of the row-set corruption fix: a hot read serves the
    state parquet lazily, so a vandalized state file must self-heal at
    plan time rather than fail the caller's collect."""
    import glob

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    cache = ParquetQueryCache(str(tmp_path / "c"))
    qc = CachedSparkSession(spark, QueryCacheConfig(cache=cache))
    sql = (
        "SELECT event_type, count(*) AS n, round(sum(value) + 1e-9, 2) AS s "
        "FROM events GROUP BY event_type ORDER BY 1"
    )
    want = rows_set(qc.sql(sql))
    assert qc.last_decision.cached
    victims = glob.glob(
        os.path.join(cache.root, "**", "*.parquet"), recursive=True
    )
    assert victims
    with open(victims[0], "wb") as fh:
        fh.write(b"\x00CORRUPT")
    out = qc.sql(sql)  # must self-heal as a miss, not raise at collect
    assert rows_set(out) == want
    assert qc.last_decision.cached
    # recomputed state serves the next read warm again
    out2 = qc.sql(sql)
    assert rows_set(out2) == want and qc.last_decision.cached

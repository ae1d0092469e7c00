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

"""Streaming cache maintenance: a foreachBatch maintainer keeps the durable
cache entries fresh; interactive readers hot-read between runs and never
scan the source. AvailableNow + checkpoint = incremental across restarts
(run 2 processes ONLY the file that arrived since run 1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_query_cache_spark import (
    CachedSparkSession,
    ParquetQueryCache,
    QueryCacheConfig,
)
from datafusion_query_cache_spark.streaming.incremental import parquet_stream
from datafusion_query_cache_spark.streaming.maintain import (
    maintain_aggregate_cache,
)
from tests.conftest import rows_set

SQL = (
    "SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n, "
    "round(sum(value), 2) AS s FROM events_m GROUP BY 1, 2"
)


def test_maintainer_feeds_hot_readers(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cache_dir = str(tmp_path / "cache")
    ev = spark.table("events")
    cut = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0])

    # phase 1: only the first half of the data exists
    ev.filter(F.col("ts_ns") < F.lit(cut)).select(
        "event_id", "event_type", "value", F.col("ts_ns").alias("ts")
    ).coalesce(1).write.mode("overwrite").parquet(src)

    def run_maintainer():
        stream = parquet_stream(spark, src, ns_timestamp_columns=["ts"])
        q = maintain_aggregate_cache(
            stream,
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(cache_dir), default_temporal_column="ts"
            ),
            [SQL],
            "events_m",
            ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

    run_maintainer()

    # reader: shares ONLY the cache directory; its view is the same source
    reader_cfg = QueryCacheConfig(
        cache=ParquetQueryCache(cache_dir), default_temporal_column="ts"
    )
    reader = CachedSparkSession(spark, reader_cfg)

    def register_reader_view():
        # same ns→(µs ts, raw shadow) normalization the stream applies, so
        # the reader's fingerprint matches the maintainer's
        (
            spark.read.parquet(src)
            .withColumn("ts_ns", F.col("ts"))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            .createOrReplaceTempView("events_m")
        )

    register_reader_view()
    wm = None
    for e in reader_cfg.cache.entries():
        wm = e.watermark_ns
    assert wm is not None and wm > 0
    reader_cfg.override_now_ns = wm  # read as-of the maintained frontier
    got = reader.sql(SQL)
    d = reader.last_decision
    assert d.cache_hit and d.fresh_rows() in (None, 0)  # hot: no source scan
    want = (
        ev.filter(F.col("ts_ns") < F.lit(cut))
        .groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    assert rows_set(got) == rows_set(want)

    # phase 2: a new file arrives; the checkpointed maintainer folds ONLY it
    ev.filter(F.col("ts_ns") >= F.lit(cut)).select(
        "event_id", "event_type", "value", F.col("ts_ns").alias("ts")
    ).coalesce(1).write.mode("append").parquet(src)
    run_maintainer()

    wm2 = None
    for e in reader_cfg.cache.entries():
        wm2 = e.watermark_ns
    assert wm2 is not None and wm2 > wm  # frontier advanced
    reader_cfg.override_now_ns = wm2
    register_reader_view()
    got2 = reader.sql(SQL)
    d = reader.last_decision
    assert d.cache_hit and d.fresh_rows() in (None, 0)
    want2 = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    assert rows_set(got2) == rows_set(want2)


def test_maintainer_keeps_filter_rowset_fresh(spark, tmp_path):
    """The maintainer needs no special-casing for FILTER (row-set) queries:
    qc.sql's own warm path appends each batch's matching rows. Reader sees
    the full history row set as a hot read."""
    from datafusion_query_cache_spark.streaming.maintain import CacheMaintainer

    ev = spark.table("events")
    mid = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0])
    cache_dir = str(tmp_path / "fcache")
    sql = "SELECT event_id, event_type, value FROM events_fm WHERE value > 100"
    m = CacheMaintainer(
        spark,
        QueryCacheConfig(cache=ParquetQueryCache(cache_dir)),
        [sql],
        "events_fm",
    )
    # two time-ordered micro-batches (the documented append-only contract)
    m.process_batch(ev.filter(F.col("ts_ns") <= mid), 1)
    m.process_batch(ev.filter(F.col("ts_ns") > mid), 2)

    reader = CachedSparkSession(
        spark, QueryCacheConfig(cache=ParquetQueryCache(cache_dir))
    )
    ev.createOrReplaceTempView("events_fm")  # full history for the twin
    out = reader.sql(sql)
    d = reader.last_decision
    assert d.cached and d.cache_hit and d.refresh_tier in ("rowset", "nano")
    want = spark.sql(sql)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_maintainer_compacts_layered_entries(spark, tmp_path, monkeypatch):
    """compact_at: the maintainer folds layered big state back into one
    dir once the layer count reaches the gate — the O(full state) rewrite
    runs in the maintainer batch, never inline in a reader's query."""
    import datetime as dt

    from datafusion_query_cache_spark.cache import _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cache_dir = str(tmp_path / "cache")
    ev = spark.table("events")
    cuts = [
        int(x)
        for x in ev.approxQuantile("ts_ns", [0.4, 0.6, 0.8], 0.0)
    ]
    sql = (
        "SELECT event_id % 997 AS k, date_trunc('hour', ts) AS h, "
        "count(*) AS n FROM events_m GROUP BY 1, 2"
    )
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(cache_dir), default_temporal_column="ts"
    )

    def arrive(lo, hi):
        df = ev.filter(
            (F.col("ts_ns") >= F.lit(lo)) & (F.col("ts_ns") < F.lit(hi))
        ).select("event_id", "event_type", "value", F.col("ts_ns").alias("ts"))
        df.coalesce(1).write.mode("append").parquet(src)

    def run(compact_at=None):
        stream = parquet_stream(spark, src, ns_timestamp_columns=["ts"])
        q = maintain_aggregate_cache(
            stream, spark, cfg, [sql], "events_m", ckpt,
            available_now=True, compact_at=compact_at,
        )
        q.awaitTermination(120)

    arrive(0, cuts[0])
    run()  # populating miss (big state, partitioned write)
    arrive(cuts[0], cuts[1])
    run()  # warm fold → one tail layer
    import json

    d = next(e for e in os.listdir(cache_dir) if not e.startswith("."))
    with open(os.path.join(cache_dir, d, "meta.json")) as f:
        fp = json.load(f)["fingerprint"]
    ent = cfg.cache.entry(fp)
    assert ent.layer_count() >= 2  # layered after the incremental fold

    arrive(cuts[1], cuts[2])
    run(compact_at=2)  # gate reached → maintainer compacts after the fold
    ent = cfg.cache.entry(fp)
    assert ent.layer_count() == 0  # folded back to ONE partitioned dir

    # the compacted entry still answers exactly (reader shares the cache;
    # same ns→(µs ts, raw shadow) normalization the stream applies, so the
    # reader's fingerprint matches the maintainer's)
    reader_cfg = QueryCacheConfig(
        cache=ParquetQueryCache(cache_dir), default_temporal_column="ts"
    )
    reader = CachedSparkSession(spark, reader_cfg)
    (
        spark.read.parquet(src)
        .withColumn("ts_ns", F.col("ts"))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .createOrReplaceTempView("events_m")
    )
    wm = max(e.watermark_ns for e in reader_cfg.cache.entries())
    reader_cfg.override_now_ns = wm  # read as-of the maintained frontier
    got = reader.sql(sql)
    assert reader.last_decision.cache_hit
    assert rows_set(got) == rows_set(
        spark.sql(
            sql.replace("FROM events_m", f"FROM events WHERE ts_ns < {cuts[2]}")
        )
    )


def test_maintainer_keeps_full_composite_fresh(spark, tmp_path):
    """r16: the maintainer needs no special-casing for FULL composites
    either — each batch folds the A/M halves through qc.sql's own warm
    path; a reader's hit recomputes only the O(dim) anti side."""
    from datafusion_query_cache_spark.streaming.maintain import CacheMaintainer

    ev = spark.table("events")
    mid = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0])
    spark.sql(
        "SELECT DISTINCT event_type AS et, upper(event_type) AS big "
        "FROM events UNION ALL SELECT concat('ghost', CAST(id AS STRING)), "
        "concat('G', CAST(id AS STRING)) FROM range(4)"
    ).createOrReplaceTempView("sm_fdim")
    cache_dir = str(tmp_path / "focache")
    sql = (
        "SELECT big, count(ts) AS nf, count(*) AS n, "
        "count(DISTINCT user_id) AS du FROM events_sm "
        "FULL JOIN sm_fdim ON event_type = et GROUP BY 1 ORDER BY 1"
    )
    m = CacheMaintainer(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(cache_dir), default_temporal_column="ts"
        ),
        [sql],
        "events_sm",
    )
    m.process_batch(ev.filter(F.col("ts_ns") <= mid), 1)
    m.process_batch(ev.filter(F.col("ts_ns") > mid), 2)

    reader = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(cache_dir), default_temporal_column="ts"
        ),
    )
    ev.createOrReplaceTempView("events_sm")  # full history for the twin
    out = reader.sql(sql)
    d = reader.last_decision
    assert d.cached and d.cache_hit and d.refresh_tier == "full_outer"
    assert rows_set(out) == rows_set(spark.sql(sql))
    spark.catalog.dropTempView("sm_fdim")

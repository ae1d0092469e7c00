"""Big-aggregate-state store-back: partitionBy(bucket) layout.

When the state exceeds the driver-collect cap AND the session armed
``entry.bucket_col`` (a temporal bucket among the group keys), the
distributed fallback must write the state hive-partitioned on the bucket —
one write task per live bucket instead of a single-task ``coalesce(1)``
(the filter row-set precedent, ``cache.py`` ``append``) — and warm reads
with a bucket bound must prune whole directories.

Reference analog: ``CacheUpdateAggregateExec`` collects state into one
partition (``src/aggregate.rs:510-527``) — fine for its in-memory cache,
a scale-killer for 100 TB-cardinality state; this is the Spark-first
replacement.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


def _bucket_dirs(cache_root: str) -> list[str]:
    """All hive partition directories under any state dir of the cache."""
    out = []
    for r, dirs, _f in os.walk(cache_root):
        out.extend(d for d in dirs if "=" in d)
    return out


def test_big_state_partitioned_by_bucket(spark, tmp_path, monkeypatch):
    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-bucketed")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)
    df = spark.range(1000).select(
        F.to_timestamp(
            F.lit(base) + F.make_interval(days=F.col("id") % 7)
        ).alias("b"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    stored = entry.put(123, df, spark)
    assert stored.count() == 1000
    # hive layout: one directory per live bucket value
    dirs = _bucket_dirs(str(tmp_path / "c"))
    assert len(dirs) == 7, dirs
    assert all(d.startswith("b=") for d in dirs)
    # footer-derived row count recorded → next put skips the driver collect
    e2 = cache.entry("fp-bucketed")
    assert e2._meta.get("rows") == 1000
    # schema-pinned read restores column order and the bucket's type
    back = e2.get(spark)
    assert back.columns == ["b", "k", "v"]
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        f.dataType.simpleString() for f in df.schema.fields
    ]
    assert rows_set(back) == rows_set(df)


def test_big_state_bucket_read_prunes(spark, tmp_path, monkeypatch):
    """A bucket-bounded read of partitioned state prunes directories:
    the scan's PartitionFilters carry the bound and fewer files are read."""
    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-pruned")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)
    df = spark.range(700).select(
        F.to_timestamp(
            F.lit(base) + F.make_interval(days=F.col("id") % 7)
        ).alias("b"),
        F.col("id").alias("k"),
    )
    entry.put(5, df, spark)
    state = cache.entry("fp-pruned").get(spark)
    cut = base + dt.timedelta(days=5)
    bounded = state.filter(F.col("b") >= F.lit(cut))
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the bound landed in PartitionFilters (directory pruning), not only in
    # the data filter
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "b" in pf and ("2024" in pf or "isnotnull" in pf), pf
    assert bounded.count() == 200  # days 5,6 → 100 rows each


def test_big_state_no_bucket_still_single_part(spark, tmp_path, monkeypatch):
    """Without a temporal bucket the distributed fallback keeps the
    reference's single-part layout — and now records the row count."""
    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 10)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-flat")
    df = spark.range(50).select(F.col("id"), (F.col("id") * 3).alias("v"))
    entry.put(9, df, spark)
    assert not _bucket_dirs(str(tmp_path / "c"))
    e2 = cache.entry("fp-flat")
    assert e2._meta.get("rows") == 50
    assert rows_set(e2.get(spark)) == rows_set(df)


def test_end_to_end_big_state_incremental(spark, tmp_path, monkeypatch):
    """Two-run incremental over the events table with the cap forced low:
    the state takes the partitioned distributed path and the warm answer
    still matches plain Spark exactly."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        HistoryLog,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.cache import _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 3)
    ev = spark.table("events")
    mid = ev.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    # clean day-boundary cut: exact in ns, so view filter ≡ watermark
    cut = mid.replace(hour=0, minute=0, second=0, microsecond=0)
    cut_ns = int(cut.replace(tzinfo=dt.timezone.utc).timestamp()) * 10**9
    sql = (
        "SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n, "
        "sum(value) AS sv FROM events_big GROUP BY 1, 2"
    )
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(str(tmp_path / "qc")),
        default_temporal_column="ts",
        override_now_ns=cut_ns,
        log=HistoryLog(),
    )
    qc = CachedSparkSession(spark, cfg)
    ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events_big")
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    # the state went through the partitioned distributed path
    assert _bucket_dirs(str(tmp_path / "qc")), "expected hive bucket dirs"
    ev.createOrReplaceTempView("events_big")
    qc.config.override_now_ns = cut_ns + 10**18
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))
    spark.catalog.dropTempView("events_big")


# -- layered bucket-tail store (r12): O(changed buckets) warm writes -------


def test_bucket_tail_layers_and_reads_exact(spark, tmp_path, monkeypatch):
    """Direct put_bucket_tail flow: full partitioned put, then two tail
    layers; the layered read must reconstruct exactly the latest merged
    state, shadowed layers must not double-count, and fully-shadowed
    layers are dropped."""
    import datetime as dt

    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-layered")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)

    def state(n_days, mult):
        # k = id % 37 (coprime with n_days): every (day, k) pair occurs —
        # 370 live groups, independent of the day
        return spark.range(n_days * 200).select(
            F.to_timestamp(
                F.lit(base) + F.make_interval(days=F.col("id") % n_days)
            ).alias("b"),
            (F.col("id") % 37).alias("k"),
            (F.lit(mult) * (F.col("id") % 37 + 1)).alias("n"),
        ).groupBy("b", "k").agg(F.sum("n").alias("n"))

    s0 = state(10, 1)
    entry.put(1, s0, spark)
    assert cache.entry("fp-layered")._meta.get("bucket_col") == "b"

    # tail layer: days >= 8 rewritten with mult=2 values
    e2 = cache.entry("fp-layered")
    e2.bucket_col = "b"
    merged = state(10, 2)  # pretend the merge doubled every count
    lo = base + dt.timedelta(days=8)
    out = e2.put_bucket_tail(2, merged, lo, spark)
    assert out is not None
    m = e2._meta
    assert len(m["bparts"]) == 2 and m["bparts_lo"][0] is None
    got = {(r["b"], r["k"]): r["n"] for r in e2.get(spark).collect()}
    exp = {
        (r["b"], r["k"]): (2 * r["n"] if r["b"] >= lo else r["n"])
        for r in state(10, 1).collect()
    }
    assert got == exp
    # rows metadata stays at the LIVE count (no shadowed rows double-counted)
    assert m["rows"] == 370  # 10 days × 37 keys

    # second tail at a LOWER bound shadows the first tail entirely
    merged3 = state(10, 3)
    lo2 = base + dt.timedelta(days=7)
    out2 = e2.put_bucket_tail(3, merged3, lo2, spark)
    assert out2 is not None
    m2 = e2._meta
    assert len(m2["bparts"]) == 2  # old tail dropped (fully shadowed)
    got2 = {(r["b"], r["k"]): r["n"] for r in e2.get(spark).collect()}
    exp2 = {
        (r["b"], r["k"]): (3 * r["n"] if r["b"] >= lo2 else r["n"])
        for r in state(10, 1).collect()
    }
    assert got2 == exp2
    # a fresh entry object reads the same layered state (durability)
    e3 = cache.entry("fp-layered")
    assert e3.watermark_ns == 3
    got3 = {(r["b"], r["k"]): r["n"] for r in e3.get(spark).collect()}
    assert got3 == exp2


def test_bucket_tail_read_prunes_layers(spark, tmp_path, monkeypatch):
    """A bucket-bounded read of layered state prunes directories in EVERY
    layer (PartitionFilters carry both the layer range and the query
    bound)."""
    import datetime as dt

    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 50)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-lp")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)
    df = spark.range(600).select(
        F.to_timestamp(
            F.lit(base) + F.make_interval(days=F.col("id") % 6)
        ).alias("b"),
        F.col("id").alias("k"),
    )
    entry.put(1, df, spark)
    e2 = cache.entry("fp-lp")
    e2.bucket_col = "b"
    assert e2.put_bucket_tail(
        2, df, base + dt.timedelta(days=4), spark
    ) is not None
    bounded = e2.get(spark).filter(
        F.col("b") >= F.lit(base + dt.timedelta(days=5))
    )
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters") >= 2
    assert bounded.count() == 100  # day 5 only


def test_bucket_tail_end_to_end_dyn(spark, tmp_path, monkeypatch):
    """Dynamic sliding-window query with big state: warm refreshes take
    the bucket-tail store (log line), results stay ≡ plain at every pinned
    now, and layers accumulate then compact through the full-put cap."""
    import datetime as dt

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        HistoryLog,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.cache import _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 3)
    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    day = 24 * 3600 * 10**9
    sql = (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS dd, event_type, "
        "count(*) AS n FROM events WHERE ts > now() - INTERVAL 9 DAY "
        "GROUP BY 1, 2"
    )
    log = HistoryLog()
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "dyn")),
            default_temporal_column="ts",
            log=log,
            override_now_ns=mx - 3 * day,
        ),
    )
    qc.sql(sql).collect()  # miss
    for i, now in enumerate([mx - 2 * day, mx - 3 * day // 2, mx + 1]):
        qc.config.override_now_ns = now
        got = qc.sql(sql)
        assert qc.last_decision.cache_hit
        lo = dt.datetime(1970, 1, 1) + dt.timedelta(
            microseconds=(now - 9 * day) // 1000
        )
        # ceil to µs: flooring would exclude a µs-aligned row AT ts == now-1ns
        hi = dt.datetime(1970, 1, 1) + dt.timedelta(
            microseconds=-(-now // 1000)
        )
        plain = spark.sql(
            sql.replace(
                "now() - INTERVAL 9 DAY",
                f"TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S.%f}' "
                f"AND ts < TIMESTAMP '{hi:%Y-%m-%d %H:%M:%S.%f}'",
            )
        )
        from tests.conftest import rows_set

        assert rows_set(got) == rows_set(plain), f"refresh {i}"
    assert any("bucket-tail layer" in m for m in log.messages())


def test_layered_state_never_driver_collected(spark, tmp_path, monkeypatch):
    """Explicit invariant (not a row-count assumption): layered (bparts)
    state must only be readable through the range-filtered layered union —
    get_arrow()/state_parquet_paths() raw-concat layer dirs and would
    double-count buckets shadowed by newer layers."""
    import datetime as dt

    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-guard")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)

    def state(mult):
        return (
            spark.range(2000)
            .select(
                F.to_timestamp(
                    F.lit(base) + F.make_interval(days=F.col("id") % 10)
                ).alias("b"),
                (F.col("id") % 37).alias("k"),
                (F.lit(mult) * (F.col("id") % 37 + 1)).alias("n"),
            )
            .groupBy("b", "k")
            .agg(F.sum("n").alias("n"))
        )

    entry.put(1, state(1), spark)
    e2 = cache.entry("fp-guard")
    e2.bucket_col = "b"
    assert (
        e2.put_bucket_tail(2, state(2), base + dt.timedelta(days=8), spark)
        is not None
    )
    assert e2._meta.get("bparts")
    # even with a tiny rows value the guards refuse driver-side raw reads
    assert e2.get_arrow() is None
    assert e2.state_parquet_paths() is None
    # the layered read remains exact
    got = {(r["b"], r["k"]): r["n"] for r in e2.get(spark).collect()}
    lo = base + dt.timedelta(days=8)
    exp = {
        (r["b"], r["k"]): (2 * r["n"] if r["b"] >= lo else r["n"])
        for r in state(1).collect()
    }
    assert got == exp


def _mk_state(spark, base, mult, n_days=10):
    return (
        spark.range(n_days * 200)
        .select(
            F.to_timestamp(
                F.lit(base) + F.make_interval(days=F.col("id") % n_days)
            ).alias("b"),
            (F.col("id") % 37).alias("k"),
            (F.lit(mult) * (F.col("id") % 37 + 1)).alias("n"),
        )
        .groupBy("b", "k")
        .agg(F.sum("n").alias("n"))
    )


def test_layer_cap_amortized_no_full_rewrite(spark, tmp_path, monkeypatch):
    """Past the layer cap the refresh must pair-merge tail layers inline —
    NEVER fall back to the O(full state) put() cliff: every tail store
    succeeds, the layer count stays at the cap, the BASE layer dir is never
    rewritten, at most 2 new dirs appear per refresh (tail + one merged
    pair), and the layered read stays exact throughout."""
    import os as _os

    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    monkeypatch.setattr(_ParquetEntry, "BPARTS_COMPACT_AT", 4)
    cdir = tmp_path / "c"
    cache = ParquetQueryCache(str(cdir))
    entry = cache.entry("fp-amortized")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)
    entry.put(1, _mk_state(spark, base, 1), spark)
    edir = next(p for p in cdir.iterdir() if p.is_dir())
    base_layer = cache.entry("fp-amortized")._meta["state"]

    mult = 1
    for step in range(2, 12):  # 10 refreshes ≫ cap=4
        e = cache.entry("fp-amortized")
        e.bucket_col = "b"
        mult = step
        lo = base + dt.timedelta(days=6 + (step % 3))  # wobbling tail bound
        before = {p.name for p in edir.iterdir() if p.is_dir()}
        out = e.put_bucket_tail(step, _mk_state(spark, base, mult), lo, spark)
        assert out is not None, f"refresh {step} fell back to full put"
        after = {p.name for p in edir.iterdir() if p.is_dir()}
        assert len(after - before) <= 2  # tail + at most one pair merge
        m = e._meta
        assert len(m["bparts"]) <= 4
        assert m["bparts"][0] == base_layer  # base never rewritten
        # the r12 cliff bound: rows WRITTEN this refresh stay well under
        # the O(full state) rewrite (370 live rows) — changed-bucket tail
        # (≤4 days × 37 keys) plus one small-pair merge quantum
        import pyarrow.dataset as _ds

        written = sum(
            _ds.dataset(str(edir / d), format="parquet").count_rows()
            for d in (after - before)
        )
        assert written <= 300, f"refresh {step} wrote {written} rows"
    # exactness: replay the bound history driver-side — below each bound the
    # values of the most recent refresh that covered the bucket survive
    vals = {}
    for r in _mk_state(spark, base, 1).collect():
        vals[(r["b"], r["k"])] = r["n"]
    state = dict(vals)
    for step in range(2, 12):
        lo = base + dt.timedelta(days=6 + (step % 3))
        for r in _mk_state(spark, base, step).collect():
            if r["b"] >= lo:
                state[(r["b"], r["k"])] = r["n"]
    e = cache.entry("fp-amortized")
    got = {(r["b"], r["k"]): r["n"] for r in e.get(spark).collect()}
    assert got == state


def test_compact_folds_layered_state(spark, tmp_path, monkeypatch):
    """entry.compact(): the maintainer-facing full compaction folds a
    layered state back to ONE partitioned dir, preserving watermark, rows
    and values; no-op on unlayered entries."""
    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-compact")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)
    entry.put(1, _mk_state(spark, base, 1), spark)
    e2 = cache.entry("fp-compact")
    e2.bucket_col = "b"
    lo = base + dt.timedelta(days=8)
    assert e2.put_bucket_tail(2, _mk_state(spark, base, 2), lo, spark) is not None
    assert e2.layer_count() == 2
    exp = {(r["b"], r["k"]): r["n"] for r in e2.get(spark).collect()}

    assert e2.compact(spark) is True
    assert e2.layer_count() == 0 and e2._meta.get("bparts") is None
    assert e2.watermark_ns == 2
    got = {(r["b"], r["k"]): r["n"] for r in e2.get(spark).collect()}
    assert got == exp
    # durability: a fresh entry object reads the compacted state
    e3 = cache.entry("fp-compact")
    got3 = {(r["b"], r["k"]): r["n"] for r in e3.get(spark).collect()}
    assert got3 == exp
    assert e3.compact(spark) is False  # unlayered: no-op


def test_bucket_tail_burst_aborts_to_distributed_write(
    spark, tmp_path, monkeypatch
):
    """r15: the driver small-tail gate estimates from OLD state only; a
    burst refresh (tiny old tail, huge fresh delta) must not collect the
    whole tail onto the driver. The write bounds the ACTUAL collect via
    limit(cap+1), aborts past the cap, and the distributed partitionBy
    write takes over — layered state stays exact either way."""
    import datetime as dt

    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 100)
    calls: list[tuple[int, bool]] = []
    orig = _ParquetEntry._write_tail_driver

    def spy(self, tail, bcol, path, cap):
        got = orig(self, tail, bcol, path, cap)
        calls.append((cap, got))
        return got

    monkeypatch.setattr(_ParquetEntry, "_write_tail_driver", spy)

    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-burst")
    entry.bucket_col = "b"
    base = dt.datetime(2024, 1, 1)

    def day(i):
        return F.to_timestamp(F.lit(base) + F.make_interval(days=F.lit(i)))

    def state(tail_keys: int):
        head = spark.range(8 * 37).select(
            F.to_timestamp(
                F.lit(base) + F.make_interval(days=F.col("id") % 8)
            ).alias("b"),
            (F.col("id") % 37).alias("k"),
            (F.col("id") % 37 + 1).alias("n"),
        )
        tail = spark.range(2 * tail_keys).select(
            F.to_timestamp(
                F.lit(base) + F.make_interval(days=F.lit(8) + F.col("id") % 2)
            ).alias("b"),
            (F.col("id") % tail_keys + 1000).alias("k"),
            F.lit(7).cast("long").alias("n"),
        )
        return head.unionByName(tail)

    # old state: 296 head rows + 2 tail rows (> cap_rows=100 → big-state
    # path armed; old-tail estimate = 2 ≤ 50 → driver write attempted)
    entry.put(1, state(tail_keys=1), spark)
    assert cache.entry("fp-burst")._meta.get("bucket_col") == "b"

    e2 = cache.entry("fp-burst")
    e2.bucket_col = "b"
    burst = state(tail_keys=300)  # actual tail: 600 rows >> cap 50
    lo = base + dt.timedelta(days=8)
    out = e2.put_bucket_tail(2, burst, lo, spark)
    assert out is not None
    # the driver write was attempted (est=2 passed the gate) but must
    # have aborted on the actual row count — no unbounded toArrow
    assert calls and calls[-1] == (50, False), calls
    # the distributed write produced the layer; layered read is exact
    got = rows_set(e2.get(spark))
    assert got == rows_set(burst)
    # durability: a fresh entry reads the same
    e3 = cache.entry("fp-burst")
    assert rows_set(e3.get(spark)) == got

    # a SMALL tail still takes the driver fast path (returns True)
    e3.bucket_col = "b"
    small = state(tail_keys=3)
    out2 = e3.put_bucket_tail(3, small, lo, spark)
    assert out2 is not None
    assert calls[-1] == (50, True), calls
    assert rows_set(e3.get(spark)) == rows_set(small)


def test_first_put_bounded_collect_spills(spark, tmp_path, monkeypatch):
    """r15: a FIRST put of a giant-cardinality state must not collect
    unbounded through the driver — the bounded collect detects the
    overflow row and spills to the distributed store; values exact."""
    from datafusion_query_cache_spark.cache import ParquetQueryCache, _ParquetEntry

    monkeypatch.setattr(_ParquetEntry, "DRIVER_COLLECT_MAX_ROWS", 50)
    collected = []
    orig = type(spark.range(1)).toArrow

    cache = ParquetQueryCache(str(tmp_path / "c"))
    entry = cache.entry("fp-firstput")
    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    stored = entry.put(7, df, spark)
    assert stored.count() == 500
    # spilled to the distributed single-part layout, rows recorded
    e2 = cache.entry("fp-firstput")
    assert e2._meta.get("rows") == 500
    assert rows_set(e2.get(spark)) == rows_set(df)

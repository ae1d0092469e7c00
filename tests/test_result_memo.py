"""Result memo: a hot read (empty refresh window) at a watermark this
session already finalized returns the memoized DataFrame with zero Spark
work. Sound because state is immutable per watermark and finalize is pure;
any watermark advance changes the key."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import rows_set

SQL = (
    "SELECT date_trunc('hour', ts) AS h, count(*) AS n, "
    "round(sum(value), 2) AS s FROM events_rm GROUP BY 1"
)


def _cut(spark):
    return int(spark.table("events").approxQuantile("ts_ns", [0.5], 0.0)[0])


def test_hot_reread_served_from_memo(spark, qc):
    ev = spark.table("events")
    cut = _cut(spark)
    ev.createOrReplaceTempView("events_rm")
    qc.config.override_now_ns = cut
    first = qc.sql(SQL)
    assert not qc.last_decision.served_from_memo
    # re-read at the same (or earlier) now: refresh window provably empty
    qc.config.override_now_ns = cut - 1
    again = qc.sql(SQL)
    d = qc.last_decision
    assert d.cache_hit and d.served_from_memo
    assert rows_set(again) == rows_set(first)
    # results are as-of the watermark (ts < cut), like any hot read
    want = (
        ev.filter(F.col("ts_ns") < F.lit(cut))
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    assert rows_set(again) == rows_set(want)


def test_watermark_advance_invalidates_memo(spark, qc):
    ev = spark.table("events")
    cut = _cut(spark)
    ev.filter(F.col("ts_ns") < F.lit(cut)).createOrReplaceTempView("events_rm")
    qc.config.override_now_ns = cut
    qc.sql(SQL).collect()
    qc.sql(SQL).collect()
    assert qc.last_decision.served_from_memo  # memo active at wm=cut
    # new data + a later now: must NOT serve the old memo
    ev.createOrReplaceTempView("events_rm")
    qc.config.override_now_ns = cut + 10**18
    got = qc.sql(SQL)
    d = qc.last_decision
    assert d.cache_hit and not d.served_from_memo
    assert rows_set(got) == rows_set(spark.sql(SQL.replace("events_rm", "events")))
    # and the refreshed result seeds a NEW memo entry at the new watermark
    got2 = qc.sql(SQL)
    assert qc.last_decision.served_from_memo
    assert rows_set(got2) == rows_set(spark.sql(SQL.replace("events_rm", "events")))


def test_refresh_interval_serves_within_window(spark, qc):
    """min_refresh_interval_ns: a re-run within the interval serves as-of
    the stored watermark (zero-work with the memo); past the interval it
    does a real incremental refresh."""
    ev = spark.table("events")
    cut = _cut(spark)
    ev.createOrReplaceTempView("events_rm")
    qc.config.override_now_ns = cut
    qc.config.min_refresh_interval_ns = 10**9  # 1s staleness budget
    first = qc.sql(SQL)
    # 0.5s later: inside the interval → hot (memo) serve as-of cut
    qc.config.override_now_ns = cut + 5 * 10**8
    again = qc.sql(SQL)
    d = qc.last_decision
    assert d.cache_hit and d.served_from_memo and d.watermark_ns == cut
    assert rows_set(again) == rows_set(first)
    # 2s later: past the interval → genuine refresh, watermark advances
    qc.config.override_now_ns = cut + 2 * 10**9
    ref = qc.sql(SQL)
    d = qc.last_decision
    assert d.cache_hit and not d.served_from_memo
    want = (
        ev.filter(F.col("ts_ns") < F.lit(cut + 2 * 10**9))
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    assert rows_set(ref) == rows_set(want)


def test_memo_disabled_by_config(spark, qc):
    ev = spark.table("events")
    cut = _cut(spark)
    qc.config.result_memo = False
    ev.createOrReplaceTempView("events_rm")
    qc.config.override_now_ns = cut
    first = qc.sql(SQL)
    again = qc.sql(SQL)
    d = qc.last_decision
    assert d.cache_hit and not d.served_from_memo
    assert rows_set(again) == rows_set(first)


def test_memo_keyed_by_post_shape(spark, qc_mem):
    """Queries sharing a fingerprint (same state entry) but differing in
    ORDER BY / LIMIT / select order must NOT share a memoized result —
    r12 find: at a pinned now, `LIMIT 2` hot-served its 2 rows to a later
    `LIMIT 4`, and DESC got the ASC rows."""
    from pyspark.sql import functions as F

    mx = int(spark.table("events").agg(F.max("ts_ns")).collect()[0][0])
    qc_mem.config.override_now_ns = mx + 10**9
    base = "SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1"
    a = qc_mem.sql(base + " LIMIT 2")
    assert a.count() == 2
    b = qc_mem.sql(base + " LIMIT 4")
    assert b.count() == 4  # was 2 before the fix
    c = qc_mem.sql(base + " DESC LIMIT 2")
    rows = [r[0] for r in c.collect()]
    assert rows == sorted(rows, reverse=True), rows
    # and a TRUE repeat still hot-serves from the memo
    qc_mem.sql(base + " LIMIT 2").collect()
    assert qc_mem.last_decision.served_from_memo

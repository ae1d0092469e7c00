"""Fingerprint stability across separate Spark sessions/processes (SURVEY
§7 hard-part 2 / VERDICT r1 item 9): a durable cache (ParquetQueryCache on
object storage) is only shareable if the same SQL against the same schema
produces the IDENTICAL fingerprint string in a brand-new JVM — the
fingerprint is canonical IR + resolved schema, deliberately NOT a Spark
plan string (those embed per-session expression ids)."""

from __future__ import annotations

import subprocess
import sys

from tests.conftest import SF_DIR

SQL = (
    "SELECT date_trunc('hour', ts) AS h, round(avg(value) + 1e-9, 2) AS av, "
    "count(*) AS n FROM events WHERE value > 1 GROUP BY 1 ORDER BY 1"
)

_CHILD = f"""
import sys
from datafusion_query_cache_spark import CachedSparkSession, QueryCacheConfig, MemoryQueryCache
from datafusion_query_cache_spark.sources.tables import get_session, register_testdata
spark = get_session(app="fp-child", cpus="4")
spark.sparkContext.setLogLevel("ERROR")
register_testdata(spark, {SF_DIR!r})
qc = CachedSparkSession(spark, QueryCacheConfig(cache=MemoryQueryCache(), default_temporal_column="ts"))
qc.sql({SQL!r})
print("FP::" + qc.last_decision.fingerprint, flush=True)
"""


def test_fingerprint_identical_in_fresh_process(spark, qc):
    qc.sql(SQL)
    fp_here = qc.last_decision.fingerprint
    assert fp_here

    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("FP::")]
    assert lines, proc.stdout[-2000:]
    fp_there = lines[-1][len("FP::"):]
    assert fp_there == fp_here


def test_fingerprint_normalizes_conjunct_order(spark, qc):
    """AND-conjunct order must not split the cache (canon_predicate sorts):
    two spellings of the same predicate share one entry."""
    a = "SELECT count(*) AS n FROM events WHERE value > 1 AND user_id > 0"
    b = "SELECT count(*) AS n FROM events WHERE user_id > 0 AND value > 1"
    qc.sql(a)
    fp_a = qc.last_decision.fingerprint
    qc.sql(b)
    fp_b = qc.last_decision.fingerprint
    assert fp_a == fp_b


def test_fingerprint_includes_session_timezone(spark, tmp_path):
    """r12 find: bucket values (date_trunc/to_date) are session-timezone
    dependent — a Chicago session hitting UTC-built cached state silently
    returned UTC-bucketed answers from a shared durable cache. The session
    timezone is now part of every fingerprint: cross-tz sessions get
    separate entries; same-tz sessions keep sharing."""
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    day = 24 * 3600 * 10**9
    cdir = str(tmp_path / "tzshare")
    SQL = (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        qc = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(cdir),
                default_temporal_column="ts",
                override_now_ns=mx - 2 * day,
            ),
        )
        qc.sql(SQL).collect()
        fp_utc = qc.last_decision.fingerprint
        assert f"|tz={tz0}" in fp_utc

        spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
        qc2 = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(cdir),
                default_temporal_column="ts",
                override_now_ns=mx + 10**9,
            ),
        )
        got = [tuple(r) for r in qc2.sql(SQL).collect()]
        assert not qc2.last_decision.cache_hit  # separate entry, not UTC's
        assert qc2.last_decision.fingerprint != fp_utc
        plain = [
            tuple(r)
            for r in spark.sql(
                SQL.replace(
                    "FROM events",
                    f"FROM events WHERE ts < "
                    f"timestamp_micros({-(-(mx + 10**9) // 1000)})",
                )
            ).collect()
        ]
        assert got == plain  # Chicago-bucketed, not UTC-bucketed
        # a SAME-tz session keeps sharing the (Chicago) entry
        qc3 = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(cdir),
                default_temporal_column="ts",
                override_now_ns=mx + 2 * 10**9,
            ),
        )
        qc3.sql(SQL).collect()
        assert qc3.last_decision.cache_hit
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)

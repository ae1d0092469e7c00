"""Runnable end-to-end demo — the analogue of the reference's
``examples/demo.rs`` (its only executable documentation).

Flow (mirrors ``demo.rs:17-63``): run the flagship query over "yesterday's"
data (cache miss, state stored) → more data "arrives" → run the same SQL
again (cache hit: only new rows scanned, merged with state) → run the same
SQL uncached and print both, plus the row-count evidence that replaces the
reference's ``EXPLAIN ANALYZE``.

    python demo.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import sys
import tempfile

from pyspark.sql import functions as F

from datafusion_query_cache_spark import (
    CachedSparkSession,
    HistoryLog,
    ParquetQueryCache,
    QueryCacheConfig,
)
from datafusion_query_cache_spark.sources.tables import get_session, register_testdata

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

SQL = (
    "SELECT date_trunc('hour', ts) AS h, round(avg(value), 2) AS avg_value, "
    "count(*) AS n FROM records WHERE value > 1 GROUP BY 1 ORDER BY 1 DESC LIMIT 8"
)


def main() -> None:
    spark = get_session(app="qc-demo", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)

    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.75], 0.0)[0]) // 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    total = ev.count()

    log = HistoryLog()
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-demo-")),
            override_now_ns=cut_us * 1000,  # pin "now" like demo.rs:79
            log=log,
        ),
    )

    print(f"== run 1: {SQL}")
    ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("records")
    for row in qc.sql(SQL).collect():
        print("  ", row)
    d = qc.last_decision
    print(f"   [cache {'HIT' if d.cache_hit else 'MISS'}]")

    print("\n== new data arrives; run 2, same SQL")
    ev.createOrReplaceTempView("records")
    qc.config.override_now_ns = cut_us * 1000 + 10**17
    rows2 = qc.sql(SQL).collect()
    for row in rows2:
        print("  ", row)
    d = qc.last_decision
    fresh = d.fresh_rows()
    print(
        f"   [cache {'HIT' if d.cache_hit else 'MISS'}; scanned "
        f"{fresh if fresh is not None else '?'} fresh rows of {total} total]"
    )

    print("\n== same SQL, uncached (the correctness oracle, demo.rs:43-50)")
    rows3 = spark.sql(SQL).collect()
    for row in rows3:
        print("  ", row)
    print(
        "\ncached == uncached:",
        [tuple(r) for r in rows2] == [tuple(r) for r in rows3],
    )

    print("\n== decision log")
    for r in log.history():
        print(f"   [{r.level}] {r.message}")

    print("\n== explain(): one-call decision trace (r11)")
    print(qc.explain(SQL))

    print("\n== audit(): trust-but-verify bucket recompute (r11)")
    report = qc.audit(d.fingerprint, buckets=4)
    print(
        f"   {sum(b.ok for b in report.buckets)}/{len(report.buckets)} "
        f"buckets match the raw recompute (ok={report.ok})"
    )


if __name__ == "__main__":
    main()

"""Per-refresh cost diagnostic for the dynamic-bound warm tiers.

Runs one miss + three advancing warm refreshes of a sliding-window query
at the given scale factor and prints, per refresh, the wall time, the
tier that served it (nano / lite / template / classic), and the fresh-row
count — then the plain-rescan baseline for comparison.

Usage: python tools/profile_dyn.py [sf_dir]   (default /root/testdata/sf0.1)
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_query_cache_spark import (  # noqa: E402
    CachedSparkSession, ParquetQueryCache, QueryCacheConfig,
)
from datafusion_query_cache_spark.sources.tables import (  # noqa: E402
    get_session, register_parquet_view,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DAY_NS = 86_400_000_000_000

spark = get_session(app="qc-profile-dyn")
spark.sparkContext.setLogLevel("ERROR")
ev = register_parquet_view(
    spark, "events", os.path.join(SF_DIR, "events.parquet")
)
import pyspark.sql.functions as F  # noqa: E402

hi_ns = int(ev.agg(F.max("ts_ns")).collect()[0][0])

DYN_SQL = (
    "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
    "FROM events WHERE ts > now() - INTERVAL 10 DAY GROUP BY 1"
)

qc = CachedSparkSession(
    spark,
    QueryCacheConfig(
        cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-prof-")),
        default_temporal_column="ts",
        override_now_ns=hi_ns - 2 * DAY_NS,
    ),
)
t0 = time.perf_counter()
qc.sql(DYN_SQL).collect()
print(f"miss: {time.perf_counter() - t0:.3f}s")

for now_ns in (hi_ns - 3 * DAY_NS // 2, hi_ns - DAY_NS, hi_ns + 10**9):
    qc.config.override_now_ns = now_ns
    t0 = time.perf_counter()
    rows = qc.sql(DYN_SQL).collect()
    d = qc.last_decision
    print(
        f"warm: {time.perf_counter() - t0:.3f}s tier={d.refresh_tier} "
        f"fresh={d.fresh_rows_value} rows={len(rows)}"
    )

# plain twin: full-window rescan with the same advancing now literals
import datetime as _dt  # noqa: E402

for now_ns in (hi_ns - 3 * DAY_NS // 2, hi_ns - DAY_NS, hi_ns + 10**9):
    lo = _dt.datetime(1970, 1, 1) + _dt.timedelta(
        microseconds=(now_ns - 10 * DAY_NS) // 1000
    )
    t0 = time.perf_counter()
    spark.sql(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        f"FROM events WHERE ts > TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S.%f}' "
        "GROUP BY 1"
    ).collect()
    print(f"plain: {time.perf_counter() - t0:.3f}s")

"""Profile the fused dynamic-template refresh at sf0.1: where does the
fixed per-refresh cost go?  Instruments one warm refresh into phases:

  render   — Python-side SQL token rendering
  sql()    — parse + analyze (spark.sql call returns a DataFrame)
  collect  — optimize + execute + Arrow transfer (the ONE job)
  store    — put_arrow store-back (parquet write + atomic swap)
  result   — LocalRelation assembly from the Arrow slice

Run: python tools/profile_dyn.py [sf_dir]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_query_cache_spark import (  # noqa: E402
    CachedSparkSession, ParquetQueryCache, QueryCacheConfig,
)
from datafusion_query_cache_spark.sources.tables import get_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DAY_NS = 86_400_000_000_000

from datafusion_query_cache_spark.sources.tables import (  # noqa: E402
    register_parquet_view,
)

spark = get_session()
ev = register_parquet_view(
    spark, "events", os.path.join(SF_DIR, "events.parquet")
)
import pyspark.sql.functions as F  # noqa: E402

hi_ns = (
    ev.agg(F.unix_micros(F.max("ts").cast("timestamp"))).collect()[0][0] * 1000
)

DYN_SQL = (
    "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
    "FROM events WHERE ts > now() - INTERVAL 10 DAY GROUP BY 1"
)

from datafusion_query_cache_spark.log import LogStderr  # noqa: E402

qc = CachedSparkSession(
    spark,
    QueryCacheConfig(
        cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-prof-")),
        default_temporal_column="ts",
        override_now_ns=hi_ns - 2 * DAY_NS,
        log=LogStderr(),
    ),
)
qc.sql(DYN_SQL).collect()  # miss → state

# monkeypatch phase timers around the template runner internals
import datafusion_query_cache_spark.session as S  # noqa: E402

from pyspark.sql import DataFrame as _DF  # noqa: E402
from datafusion_query_cache_spark import cache as _C  # noqa: E402

orig_sql = spark.sql
orig_to_arrow = _DF.toArrow
orig_put_arrow = _C._ParquetEntry.put_arrow
orig_view = _DF.createOrReplaceTempView
phases = {}


def _timed(name, fn):
    def w(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        phases[name] = phases.get(name, 0) + time.perf_counter() - t0
        return out
    return w


for now_ns in (hi_ns - 3 * DAY_NS // 2, hi_ns - DAY_NS, hi_ns + 1):
    qc.config.override_now_ns = now_ns
    phases.clear()
    spark.sql = _timed("sql_parse", orig_sql)
    _DF.toArrow = _timed("toArrow", orig_to_arrow)
    _C._ParquetEntry.put_arrow = _timed("put_arrow", orig_put_arrow)
    _DF.createOrReplaceTempView = _timed("view_reg", orig_view)
    t0 = time.perf_counter()
    res = qc.sql(DYN_SQL)
    t_mid = time.perf_counter()
    rows = res.collect()
    t1 = time.perf_counter()
    spark.sql = orig_sql
    _DF.toArrow = orig_to_arrow
    _C._ParquetEntry.put_arrow = orig_put_arrow
    _DF.createOrReplaceTempView = orig_view
    d = qc.last_decision
    ph = " ".join(f"{k}={v:.3f}s" for k, v in phases.items())
    print(
        f"now={now_ns}: total={t1-t0:.3f}s  qc.sql()={t_mid-t0:.3f}s "
        f"result.collect()={t1-t_mid:.3f}s  {ph} "
        f"rows={len(rows)} hit={d.cache_hit} fresh={d.fresh_rows_value}"
    )

qc.config.override_now_ns = hi_ns + DAY_NS // 4
qc.sql(DYN_SQL).collect()
ldf = qc.last_refresh_df
for _ in range(3):
    t0 = time.perf_counter()
    ldf.toArrow()
    print(f"lite re-exec toArrow={time.perf_counter()-t0:.3f}s")
# fresh parse+exec of the same lite SQL text (what a refresh pays JVM-side)
lsql = ldf._jdf.queryExecution().logical().origin().sqlText().get() if False else None
import datafusion_query_cache_spark.session as S2
lkey = [k for k in qc._tpl_cache if k and k[0] == "dynlite"][0]
ltpl = qc._tpl_cache[lkey]
rhs_sql = "(timestamp_micros(%d) - INTERVAL 10 DAY)" % ((hi_ns + DAY_NS // 4) // 1000)
lsql = ltpl["sql"].replace("__QC_RHS__", rhs_sql)
lsql = qc._sub_time_tokens(lsql, "F", hi_ns - DAY_NS, hi_ns + DAY_NS // 4)
for trial in range(3):
    t0 = time.perf_counter()
    df2 = spark.sql(lsql)
    t1 = time.perf_counter()
    df2._jdf.queryExecution().executedPlan()
    t2 = time.perf_counter()
    df2.toArrow()
    t3 = time.perf_counter()
    print(f"lite parse={t1-t0:.3f} optimize={t2-t1:.3f} exec={t3-t2:.3f}")

# phase isolation: parse/analyze vs optimize vs execute, on the raw template
import datafusion_query_cache_spark.session as S  # noqa: F811

qc.config.override_now_ns = hi_ns + DAY_NS // 3
qc.sql(DYN_SQL).collect()
raw_sql_holder = {}
orig_run = type(qc)._run_dyn_warm_template


def capture_run(self, tpl, entry, cached_state, wm_ns, now_ns, dyn_rhs,
                decision, spec, state_cols):
    rhs_sql = f"({self._sql_of(S.to_column(self._pin_now(dyn_rhs, now_ns)))})"
    sql = tpl["sql"].replace("__QC_RHS__", rhs_sql)
    sql = self._sub_time_tokens(sql, "F", wm_ns, now_ns)
    sql = self._bind_state_source(tpl, entry, cached_state, sql)
    raw_sql_holder["sql"] = sql
    return orig_run(self, tpl, entry, cached_state, wm_ns, now_ns, dyn_rhs,
                    decision, spec, state_cols)


type(qc)._run_dyn_warm_template = capture_run
qc.config.override_now_ns = hi_ns + DAY_NS * 2 // 5
qc.sql(DYN_SQL).collect()
type(qc)._run_dyn_warm_template = orig_run
sql_text = raw_sql_holder["sql"]
print(f"template sql len={len(sql_text)}")
for trial in range(3):
    # re-analyzing the same text still re-runs all phases (no plan cache)
    t0 = time.perf_counter()
    df = orig_sql(sql_text)
    t1 = time.perf_counter()
    df._jdf.queryExecution().executedPlan()
    t2 = time.perf_counter()
    df.toArrow()
    t3 = time.perf_counter()
    print(
        f"parse+analyze={t1-t0:.3f}s optimize+plan={t2-t1:.3f}s "
        f"exec={t3-t2:.3f}s"
    )

# conf experiments: what cuts the per-refresh JVM compile cost?
for label, confs in [
    ("baseline", {}),
    ("no-constraint-prop", {"spark.sql.constraintPropagation.enabled": "false"}),
    ("no-cp+no-reuse", {
        "spark.sql.constraintPropagation.enabled": "false",
        "spark.sql.execution.reuseSubquery": "false",
        "spark.sql.codegen.wholeStage": "true",
    }),
    ("no-codegen", {"spark.sql.codegen.wholeStage": "false"}),
]:
    for k, v in confs.items():
        spark.conf.set(k, v)
    ts = []
    for i, off in enumerate((DAY_NS // 2, DAY_NS * 3 // 5, DAY_NS * 7 // 10,
                             DAY_NS * 4 // 5)):
        qc.config.override_now_ns = hi_ns + off
        t0 = time.perf_counter()
        qc.sql(DYN_SQL).collect()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: " + " ".join(f"{t:.3f}" for t in ts))
    for k in confs:
        spark.conf.unset(k)

# pure re-execution of the final refresh program (no parse, no python)
rdf = qc.last_refresh_df
if rdf is not None:
    for _ in range(3):
        t0 = time.perf_counter()
        rdf.toArrow()
        print(f"refresh re-exec toArrow={time.perf_counter()-t0:.3f}s")
    print(rdf._jdf.queryExecution().executedPlan().toString()[:3000])

# plain twin for reference
for _ in range(3):
    t0 = time.perf_counter()
    spark.sql(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        f"FROM events WHERE ts > timestamp_micros({(hi_ns + 1) // 1000}) "
        "- INTERVAL 10 DAY GROUP BY 1"
    ).collect()
    print(f"plain={time.perf_counter()-t0:.3f}s")

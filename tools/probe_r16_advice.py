"""Round-16 ADVICE probes: out-of-range FULL ORDER BY ordinals, CTE
shadowing a registered view (derived-table and membership-check edges),
and spec-memo staleness across view re-registration.

Each probe compares the engine's behaviour with plain Spark's: both
must answer identically, or both must refuse (rejection parity)."""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_query_cache_spark import (
    CachedSparkSession,
    HistoryLog,
    ParquetQueryCache,
    QueryCacheConfig,
)
from datafusion_query_cache_spark.sources.tables import (
    get_session,
    register_testdata,
)

SF_DIR = os.environ.get("QC_TEST_SF_DIR", "/root/testdata/sf0.001")


def rows_set(df):
    out = []
    for r in df.collect():
        vals = []
        for v in r:
            if isinstance(v, float):
                import math

                vals.append("NaN" if math.isnan(v) else round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def parity(cs, spark, q, tag):
    try:
        mine = rows_set(cs.sql(q))
        ok_mine = True
    except Exception as e:
        mine, ok_mine = f"ERR {type(e).__name__}: {e}", False
    try:
        ref = rows_set(spark.sql(q))
        ok_ref = True
    except Exception as e:
        ref, ok_ref = f"ERR {type(e).__name__}", False
    if ok_mine != ok_ref:
        print(f"FAIL [{tag}] engine={'rows' if ok_mine else mine} "
              f"spark={'rows' if ok_ref else ref}")
        return False
    if ok_mine and mine != ref:
        print(f"FAIL [{tag}] value mismatch\n  mine={mine[:3]}\n  ref={ref[:3]}")
        return False
    print(f"ok   [{tag}] {'answered' if ok_mine else 'both refused'}")
    return True


def main():
    spark = get_session(app="probe-r16", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    tmp = tempfile.mkdtemp(prefix="qc-probe16-")
    cs = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(os.path.join(tmp, "cache")),
            default_temporal_column="ts",
            log=HistoryLog(),
        ),
    )
    bad = 0

    # dim for FULL OUTER
    spark.range(30).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("segment"),
    ).createOrReplaceTempView("p16_dim")

    # 1. FULL OUTER ORDER BY ordinal out of range → both sides must refuse
    for pos in (0, 3, -1, 99):
        q = (
            "SELECT segment, count(*) AS n FROM events FULL OUTER JOIN "
            "p16_dim USING (user_id) GROUP BY segment ORDER BY "
            f"{pos}"
        )
        bad += not parity(cs, spark, q, f"fo-ordinal-{pos}")
    # sanity: in-range ordinal still answers
    bad += not parity(
        cs,
        spark,
        "SELECT segment, count(*) AS n FROM events FULL OUTER JOIN "
        "p16_dim USING (user_id) GROUP BY segment ORDER BY 2, 1",
        "fo-ordinal-ok",
    )

    # 2. CTE shadowing a registered view, qualified refs against the CTE's
    #    OWN columns (not the view's): engine must not spuriously refuse,
    #    and must never answer from the view's schema.
    q = (
        "WITH events AS (SELECT l_orderkey AS k, l_quantity AS v FROM lineitem) "
        "SELECT e.k AS k, sum(e.v) AS s FROM events e GROUP BY e.k"
    )
    bad += not parity(cs, spark, q, "cte-shadow-own-cols")
    # qualified ref NOT in the CTE (but IS in the shadowed view): both refuse
    q = (
        "WITH events AS (SELECT l_orderkey AS k, l_quantity AS v FROM lineitem) "
        "SELECT e.uid AS u, sum(e.v) AS s FROM events e GROUP BY e.uid"
    )
    bad += not parity(cs, spark, q, "cte-shadow-view-col")
    # derived table whose body references the CTE (subst doesn't recurse):
    q = (
        "WITH events AS (SELECT l_orderkey AS k, l_quantity AS v FROM lineitem) "
        "SELECT k, s FROM (SELECT e.k AS k, sum(e.v) AS s FROM events e "
        "GROUP BY e.k) t WHERE s > 0"
    )
    bad += not parity(cs, spark, q, "cte-in-derived-body")

    # 3. spec-memo staleness: parse consults schema via NATURAL desugar,
    #    then the view is re-registered with a DIFFERENT column set.
    spark.range(20).select(
        F.col("id").alias("user_id"), F.lit(1.5).alias("w")
    ).createOrReplaceTempView("p16_nat")
    q = "SELECT user_id, count(*) AS n FROM events NATURAL JOIN p16_nat GROUP BY user_id"
    bad += not parity(cs, spark, q, "natural-v1")
    # re-register with an extra common column: common set changes (uid, val)
    spark.range(20).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 2).cast("double").alias("val"),
    ).createOrReplaceTempView("p16_nat")
    bad += not parity(cs, spark, q, "natural-v2-reregistered")
    # memo perf guard: a non-NATURAL query mentioning 'natural' in a
    # literal must now be memoized
    q2 = "SELECT count(*) AS n FROM events WHERE event_type <> 'natural'"
    cs.sql(q2)
    assert any(k == q2 for k in cs._spec_cache), "literal-natural not memoized"
    print("ok   [memo-literal-natural] memoized")

    spark.catalog.dropTempView("p16_dim")
    spark.catalog.dropTempView("p16_nat")
    print("BAD =", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

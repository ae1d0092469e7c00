"""Round-14 cross-feature probes: compose the r14 surfaces (RIGHT/USING
joins, grouped correlated bodies, derived-projection inlining) with the
standing machinery (dyn bounds, set-ops, CTEs, PIVOT, window replay,
big-state layering) and compare every answer against plain Spark on the
same advancing two-run data. The last three rounds' wrong-answer classes
all fell out of this style of probing, not the ledger.

Usage: python tools/probe_r14_cross.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> int:
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.sources.tables import (
        get_session,
        register_testdata,
    )

    spark = get_session(app="qc-probe-r14", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    hi = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    # USING dim: same column name as the fact by construction
    spark.sql(
        "SELECT DISTINCT user_id, concat('s', user_id % 4) AS segment "
        "FROM events"
    ).createOrReplaceTempView("useg_u")
    # ON dim: disjoint names
    spark.range(50).select(
        F.col("id").alias("bucket_id"),
        F.concat(F.lit("b"), (F.col("id") % 3).cast("string")).alias("bseg"),
    ).createOrReplaceTempView("useg_b")

    def norm(rows):
        out = []
        for r in rows:
            out.append(
                tuple(
                    round(v, 9) if isinstance(v, float) else v for v in r
                )
            )
        return sorted(out)

    failures = []

    def two_run(
        name: str, sql: str, expect_cached: bool = True, twin: str = None
    ) -> None:
        """twin: explicit-bound spelling for dyn queries — plain Spark
        evaluates now() at REAL wall clock, so the raw sql is not
        twin-comparable under a pinned engine now."""
        qc = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-p14-")),
                default_temporal_column="ts",
                override_now_ns=cut_ns,
                strict_errors=True,
            ),
        )
        try:
            ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView(
                "events_p"
            )
            qc.sql(sql).collect()
            cached = qc.last_decision.cached
            ev.createOrReplaceTempView("events_p")
            ok = True
            for now in (cut_ns + (hi - cut_ns) // 2, hi + 1):
                qc.config.override_now_ns = now
                got = norm(qc.sql(sql).collect())
                if twin is not None:
                    lo = dt.datetime(1970, 1, 1) + dt.timedelta(
                        microseconds=(now - 12 * 86400 * 10**9) // 1000
                    )
                    exp = norm(spark.sql(twin.format(
                        lo=f"{lo:%Y-%m-%d %H:%M:%S.%f}", now=now
                    )).collect())
                elif now > hi:
                    exp = norm(spark.sql(sql).collect())
                else:
                    exp = None
                if exp is not None and got != exp:
                    ok = False
            if expect_cached and not cached:
                failures.append((name, f"not cached: {qc.last_decision.reason}"))
                print(f"  {name:34s} NOT CACHED: {qc.last_decision.reason[:60]}")
                return
            if not ok:
                failures.append((name, "value mismatch vs plain Spark"))
                print(f"  {name:34s} MISMATCH")
                return
            print(f"  {name:34s} OK (cached={cached})")
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:120]))
            print(f"  {name:34s} ERROR {str(e)[:80]}")

    # 1. derived projection UNDER a star join (projection inlines, then the
    #    join walk sees a base table)... the inliner only fires for a sole
    #    SUBQUERY source — a joined head keeps the derived-aggregate path,
    #    so spell it as CTE-over-projection joined to a dim instead
    two_run(
        "cte_projection_join_dim",
        "WITH base AS (SELECT user_id, value AS v, ts FROM events_p "
        "WHERE value > 1) "
        "SELECT bseg, count(*) AS n, round(sum(v), 2) AS sv FROM base e "
        "JOIN useg_b ON e.user_id % 50 = bucket_id "
        "GROUP BY 1 ORDER BY 1",
        expect_cached=False,  # joined CTE-projection: passthrough today
    )
    # 2. derived projection + dynamic bound + bucket group key (merge-skip)
    two_run(
        "derived_proj_dyn_bucket",
        "SELECT CAST(date_trunc('day', e_ts) AS DATE) AS d, count(*) AS n "
        "FROM (SELECT ts AS e_ts, value FROM events_p WHERE value > 0.5) "
        "WHERE e_ts > now() - INTERVAL 12 DAY GROUP BY 1 ORDER BY 1",
        twin=(
            "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
            "FROM events_p WHERE value > 0.5 AND ts > TIMESTAMP '{lo}' "
            "AND ts_ns < {now} GROUP BY 1 ORDER BY 1"
        ),
    )
    # 3. USING join + dynamic bound
    two_run(
        "using_join_dyn",
        "SELECT segment, count(*) AS n FROM events_p "
        "JOIN useg_u USING (user_id) "
        "WHERE ts > now() - INTERVAL 12 DAY GROUP BY 1 ORDER BY 1",
        twin=(
            "SELECT segment, count(*) AS n FROM events_p "
            "JOIN useg_u USING (user_id) "
            "WHERE ts > TIMESTAMP '{lo}' AND ts_ns < {now} "
            "GROUP BY 1 ORDER BY 1"
        ),
    )
    # 4. RIGHT join spelled over a set operation branch
    two_run(
        "right_join_in_setop",
        "SELECT segment, count(*) AS n FROM useg_u RIGHT JOIN events_p "
        "USING (user_id) WHERE value > 2 GROUP BY 1 "
        "UNION ALL "
        "SELECT segment, count(*) AS n FROM events_p JOIN useg_u "
        "USING (user_id) WHERE value <= 2 GROUP BY 1",
    )
    # 5. grouped correlated body + USING join in the OUTER
    two_run(
        "grouped_corr_with_using_outer",
        "SELECT segment, count(*) AS n FROM events_p e "
        "JOIN useg_u USING (user_id) WHERE e.value > "
        "(SELECT avg(x.value) FROM events_p x "
        "WHERE x.event_type = e.event_type GROUP BY x.event_type) "
        "GROUP BY 1 ORDER BY 1",
        expect_cached=False,  # corr scalar + join outer: passthrough OK
    )
    # 6. derived projection feeding a PIVOT source
    two_run(
        "derived_proj_pivot",
        "SELECT * FROM (SELECT event_type, user_id % 2 AS ub, value FROM "
        "(SELECT event_type, user_id, value, ts FROM events_p "
        "WHERE value > 1)) "
        "PIVOT (round(sum(value), 2) FOR ub IN (0, 1)) ORDER BY 1",
        expect_cached=False,  # nested-projection PIVOT source: passthrough
    )
    # 7. grouped correlated body at day grain + derived projection outer
    two_run(
        "grouped_corr_above_star_proj",
        "SELECT event_type, count(*) AS n FROM "
        "(SELECT * FROM events_p WHERE value > 0) e "
        "WHERE value > (SELECT avg(value) FROM events_p e2 "
        "WHERE date_trunc('day', e2.ts) = date_trunc('day', e.ts) "
        "GROUP BY date_trunc('day', e2.ts)) "
        "GROUP BY 1 ORDER BY 1",
    )
    # the COLUMN-LIST projection + outer subquery stays refused (the
    # substitution could capture names inside the subquery's own scope)
    two_run(
        "grouped_corr_above_list_proj",
        "SELECT event_type, count(*) AS n FROM "
        "(SELECT event_type, value, ts FROM events_p WHERE value > 0) e "
        "WHERE value > (SELECT avg(value) FROM events_p e2 "
        "WHERE date_trunc('day', e2.ts) = date_trunc('day', e.ts) "
        "GROUP BY date_trunc('day', e2.ts)) "
        "GROUP BY 1 ORDER BY 1",
        expect_cached=False,
    )
    # 8. CTE referenced with a branch alias + USING join (advice items)
    two_run(
        "cte_alias_using",
        "WITH r AS (SELECT user_id, value, ts FROM events_p WHERE value > 1) "
        "SELECT segment, count(*) AS n FROM r b JOIN useg_u USING (user_id) "
        "GROUP BY 1 ORDER BY 1",
        expect_cached=False,  # CTE + join spine: passthrough acceptable
    )
    # 9. EXISTS grouped+HAVING body above a derived projection
    two_run(
        "exists_grouped_having_above_proj",
        "SELECT event_type, count(*) AS n FROM "
        "(SELECT * FROM events_p) e "
        "WHERE EXISTS (SELECT 1 FROM events_p x WHERE x.user_id = e.user_id "
        "GROUP BY x.user_id HAVING avg(x.value) > 2.5) "
        "GROUP BY 1 ORDER BY 1",
    )
    # 10. nested set-op with a USING-join branch and OFFSET pagination
    two_run(
        "setop_using_offset",
        "(SELECT segment, count(*) AS n FROM events_p JOIN useg_u "
        "USING (user_id) GROUP BY 1 "
        "UNION ALL "
        "SELECT segment, count(*) AS n FROM useg_u RIGHT JOIN events_p "
        "USING (user_id) WHERE value > 2 GROUP BY 1) "
        "ORDER BY 1, 2 LIMIT 5 OFFSET 1",
    )

    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        for n, r in failures:
            print(" ", n, "--", r)
        return 1
    print("ALL OK (10 probes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

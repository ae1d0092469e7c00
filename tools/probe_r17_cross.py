"""Round-17 cross-feature probes: compose the r17 surfaces — FULL
composite percentile (histogram states), sum/avg(DISTINCT) set folds,
skew/kurt moment structs, corr/covar/regr co-moment structs — with the
standing machinery (two-run refreshes, FILTER clauses, HAVING over new
finalizes, grouping sets re-folds, USING merges, star spines, state
SHARING between families on one column) and compare every answer
against plain Spark on the same advancing two-run data. Six rounds of
wrong-answer classes fell out of this style of probing, not the ledger.

Usage: python tools/probe_r17_cross.py [sf_dir]
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

    spark = get_session(app="qc-probe-r17", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    hi = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    # FULL dim with never-matched rows AND duplicate dim rows (the
    # multiplicity seam the anti side must preserve)
    spark.sql(
        "SELECT DISTINCT user_id AS uid, concat('s', user_id % 4) AS seg "
        "FROM events WHERE user_id % 3 != 0 "
        "UNION ALL SELECT 7777 + id, 'ghost' FROM range(4) "
        "UNION ALL SELECT 7777, 'ghost' FROM range(1)"
    ).createOrReplaceTempView("p17_dim")
    # inner dim for star spines
    spark.sql(
        "SELECT DISTINCT event_type AS et, upper(event_type) AS big "
        "FROM events"
    ).createOrReplaceTempView("p17_inner")

    def norm(rows):
        return sorted(
            tuple(
                round(v, 7) if isinstance(v, float) else repr(v) for v in r
            )
            for r in rows
        )

    failures = []

    def two_run(name: str, sql: str, expect_cached: bool = True) -> None:
        qc = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-p17-")),
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
            qc.config.override_now_ns = hi + 1
            got = norm(qc.sql(sql).collect())
            exp = norm(spark.sql(sql).collect())
            if expect_cached and not cached:
                failures.append(
                    (name, f"not cached: {qc.last_decision.reason}")
                )
                print(
                    f"  {name:44s} NOT CACHED: "
                    f"{(qc.last_decision.reason or '')[:60]}"
                )
                return
            if got != exp:
                failures.append((name, "value mismatch vs plain Spark"))
                print(f"  {name:44s} MISMATCH")
                return
            print(f"  {name:44s} OK (cached={cached})")
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:120]))
            print(f"  {name:44s} ERROR {str(e)[:80]}")

    # --- percentile x FULL x standing machinery -------------------------
    two_run(
        "full_pctl_filter_clause",
        # FILTER desugars to CASE before the composite's _repl, so the
        # histogram state must carry the gated expression
        "SELECT seg, round(median(value) FILTER (WHERE value > 10) "
        "+ 1e-9, 2) AS mf, round(percentile(value, 0.25) + 1e-9, 2) "
        "AS q1, count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_pctl_having_on_percentile",
        "SELECT seg, round(percentile(value, 0.5) + 1e-9, 2) AS med, "
        "count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 "
        "HAVING percentile(value, 0.5) > 0 OR count(value) = 0 "
        "ORDER BY 1",
    )
    two_run(
        "full_pctl_rollup_refold",
        # coarser sets re-flatten the histogram multisets
        "SELECT seg, user_id % 2 AS ub, "
        "round(median(value) + 1e-9, 2) AS med, count(*) AS n "
        "FROM events_p FULL JOIN p17_dim ON user_id = uid "
        "GROUP BY ROLLUP (seg, ub) "
        "ORDER BY seg NULLS FIRST, ub NULLS FIRST",
    )
    two_run(
        "full_pctl_shares_state_with_var",
        # histogram + var struct + plain sum of ONE column in one entry
        "SELECT seg, round(median(value) + 1e-9, 2) AS med, "
        "round(var_samp(value), 2) AS vs, round(sum(value), 2) AS sv, "
        "count(value) AS cv FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_pctl_dim_side_column",
        # percentile over the DIM side: anti rows carry real values
        "SELECT seg, round(median(uid) + 1e-9, 2) AS mu, count(*) AS n "
        "FROM events_p FULL JOIN p17_dim ON user_id = uid "
        "GROUP BY 1 ORDER BY 1",
    )
    # --- DISTINCT folds x FULL x standing machinery ---------------------
    two_run(
        "full_distinct_sum_star_spine",
        "SELECT seg, big, sum(DISTINCT user_id) AS su, "
        "count(DISTINCT user_id) AS du, count(*) AS n FROM events_p "
        "JOIN p17_inner ON event_type = et "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1, 2 ORDER BY 1, 2",
    )
    two_run(
        "full_distinct_avg_double_col",
        "SELECT seg, round(avg(DISTINCT value) + 1e-9, 4) AS av, "
        "count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_distinct_sum_grouping_sets",
        "SELECT seg, grouping(seg) AS gs, sum(DISTINCT user_id) AS su, "
        "count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid "
        "GROUP BY CUBE (seg) ORDER BY seg NULLS FIRST, gs",
    )
    # --- moments x FULL x standing machinery ----------------------------
    two_run(
        "full_skew_kurt_share_with_var_sum",
        # moment struct + var struct + plain count/sum share the same
        # count/sum states via dedup — every output must still resolve
        "SELECT seg, round(skewness(value) + 1e-9, 3) AS sk, "
        "round(kurtosis(value) + 1e-9, 3) AS ku, "
        "round(var_samp(value), 2) AS vs, round(sum(value), 2) AS sv, "
        "count(value) AS cv, count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_skew_filter_clause",
        "SELECT seg, round(skewness(value) FILTER (WHERE value > 5) "
        "+ 1e-9, 3) AS skf, count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_corr_regr_share_struct",
        # corr(a,b) and regr_*(b,a) share one co-moment struct
        "SELECT seg, round(corr(value, user_id) + 1e-9, 6) AS co, "
        "round(regr_slope(user_id, value) + 1e-9, 6) AS sl, "
        "regr_count(user_id, value) AS rc, count(*) AS n "
        "FROM events_p FULL JOIN p17_dim ON user_id = uid "
        "GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_corr_having_and_rollup",
        "SELECT seg, user_id % 2 AS ub, "
        "round(covar_pop(value, user_id) + 1e-9, 2) AS cp, "
        "count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid "
        "GROUP BY ROLLUP (seg, ub) "
        "HAVING count(*) > 0 "
        "ORDER BY seg NULLS FIRST, ub NULLS FIRST",
    )
    two_run(
        "full_whole_vocab_one_entry",
        # every r16+r17 family in ONE composite entry: heterogeneous
        # states must round-trip the store and merge independently
        "SELECT seg, count(*) AS n, round(sum(value), 2) AS sv, "
        "round(avg(value) + 1e-9, 4) AS av, min(value) AS mn, "
        "count(DISTINCT event_type) AS de, sum(DISTINCT user_id) AS su, "
        "round(median(value) + 1e-9, 2) AS med, "
        "round(stddev(value) + 1e-9, 3) AS sd, "
        "round(skewness(value) + 1e-9, 3) AS sk, "
        "round(corr(value, user_id) + 1e-9, 5) AS co, "
        "max_by(event_type, value) AS mb, "
        "approx_count_distinct(user_id) AS ad "
        "FROM events_p FULL JOIN p17_dim ON user_id = uid "
        "GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_aggregate_arithmetic_over_finalizes",
        # arbitrary expression trees OVER the new finalizes: the output
        # compiler rewrites every nested AggCall onto its state
        "SELECT seg, round(percentile(value, 0.9) - median(value) "
        "+ 1e-9, 2) AS spread, "
        "round(sum(DISTINCT user_id) / count(DISTINCT user_id) "
        "+ 1e-9, 3) AS davg, "
        "round(skewness(value) * 2 + 1 + 1e-9, 3) AS sk2, "
        "count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_order_by_percentile_output",
        "SELECT seg, round(median(value) + 1e-9, 2) AS med, "
        "count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 "
        "ORDER BY 2 DESC NULLS LAST, 1",
    )
    # --- refusal parity on the new seams (passthrough must match) -------
    two_run(
        "full_mode_passthrough",
        "SELECT seg, mode(value) AS mo, count(*) AS n FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
        expect_cached=False,
    )
    two_run(
        "full_multiarg_distinct_two_run",
        "SELECT seg, count(DISTINCT user_id, event_type) AS d2, "
        "count(*) AS n FROM events_p FULL JOIN p17_dim ON user_id = uid "
        "GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_expr_distinct_passthrough",
        "SELECT seg, sum(DISTINCT user_id + 1) AS sx FROM events_p "
        "FULL JOIN p17_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
        expect_cached=False,
    )
    two_run(
        "moving_scalar_middle_passthrough",
        "SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
        "FROM events_p WHERE value > (SELECT avg(value) FROM events_p "
        "WHERE ts < now()) GROUP BY event_type) t ORDER BY 1",
        expect_cached=False,
    )

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, r in failures:
            print(f"  {n}: {r}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

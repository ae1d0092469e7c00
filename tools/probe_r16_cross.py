"""Round-16 cross-feature probes: compose the r16 surfaces — FULL-star
composite, count(DISTINCT)/approx_count_distinct on FULL, static-inner
nested folds (scalar/IN/EXISTS), substring dedup boundaries — with the
standing machinery (two-run refreshes, HAVING, USING merges, derived
tables, watermark advances) and compare every answer against plain
Spark on the same advancing two-run data. Five rounds of wrong-answer
classes fell out of this style of probing, not the ledger.

Usage: python tools/probe_r16_cross.py [sf_dir]
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

    spark = get_session(app="qc-probe-r16", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    hi = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    # inner dim with partial coverage
    spark.sql(
        "SELECT DISTINCT user_id, concat('s', user_id % 4) AS segment "
        "FROM events WHERE user_id % 3 != 0"
    ).createOrReplaceTempView("p16_seg")
    # FULL dim with never-matched rows
    spark.sql(
        "SELECT DISTINCT event_type AS et, upper(event_type) AS big "
        "FROM events UNION ALL SELECT concat('ghost', CAST(id AS STRING)), "
        "concat('G', CAST(id AS STRING)) FROM range(5)"
    ).createOrReplaceTempView("p16_fdim")
    # USING-keyed FULL dim with holes
    spark.range(12).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("useg"),
    ).createOrReplaceTempView("p16_dimu")

    def norm(rows):
        return sorted(
            tuple(
                round(v, 9) if isinstance(v, float) else repr(v) for v in r
            )
            for r in rows
        )

    failures = []

    def two_run(name: str, sql: str, expect_cached: bool = True) -> None:
        qc = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-p16-")),
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
                    f"  {name:40s} NOT CACHED: "
                    f"{(qc.last_decision.reason or '')[:60]}"
                )
                return
            if got != exp:
                failures.append((name, "value mismatch vs plain Spark"))
                print(f"  {name:40s} MISMATCH")
                return
            print(f"  {name:40s} OK (cached={cached})")
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:120]))
            print(f"  {name:40s} ERROR {str(e)[:80]}")

    # --- FULL star x standing machinery ---------------------------------
    two_run(
        "full_star_two_run",
        "SELECT big, segment, count(ts) AS nf, count(*) AS n, "
        "round(sum(value), 2) AS sv FROM events_p "
        "JOIN p16_seg USING (user_id) FULL JOIN p16_fdim ON event_type = et "
        "GROUP BY 1, 2 ORDER BY 1, 2",
    )
    two_run(
        "full_star_left_edge_where_having",
        "SELECT big, count(ts) AS nf, count(segment) AS ns, count(*) AS n "
        "FROM events_p LEFT JOIN p16_seg USING (user_id) "
        "FULL JOIN p16_fdim ON event_type = et WHERE value > 2 "
        "GROUP BY 1 HAVING count(*) > 0 ORDER BY 1",
    )
    two_run(
        "full_star_using_full_edge",
        "SELECT useg, big, count(ts) AS nf, count(*) AS n FROM events_p "
        "JOIN p16_fdim ON event_type = et FULL JOIN p16_dimu "
        "USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2",
    )
    two_run(
        "full_star_avg_decompose",
        "SELECT big, round(avg(value), 4) AS av, count(*) AS n "
        "FROM events_p JOIN p16_seg USING (user_id) "
        "FULL JOIN p16_fdim ON event_type = et GROUP BY 1 ORDER BY 1",
    )
    # --- DISTINCT/approx on FULL x refresh/retraction --------------------
    two_run(
        "full_count_distinct_two_run",
        "SELECT big, count(DISTINCT user_id) AS du, "
        "count(DISTINCT segment) AS ds, count(*) AS n FROM events_p "
        "JOIN p16_seg USING (user_id) FULL JOIN p16_fdim ON event_type = et "
        "GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_approx_distinct_two_run",
        "SELECT big, approx_count_distinct(user_id) AS u, count(*) AS n "
        "FROM events_p FULL JOIN p16_fdim ON event_type = et "
        "GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "full_distinct_in_having",
        "SELECT big, count(*) AS n FROM events_p "
        "FULL JOIN p16_fdim ON event_type = et GROUP BY 1 "
        "HAVING count(DISTINCT user_id) >= 0 ORDER BY 1",
    )
    # --- nested static folds x joins / dyn / derived replay ---------------
    two_run(
        "nested_static_scalar_two_run",
        "SELECT k, n, s FROM (SELECT event_type AS k, count(*) AS n, "
        "round(sum(value), 2) AS s FROM events_p "
        "WHERE value > (SELECT max(value) FROM events_p) / 2 "
        "GROUP BY event_type) t ORDER BY k",
    )
    two_run(
        "nested_static_in_star_join",
        # star-join outer + static scalar: _plan_scalar_outer cannot
        # assemble joins, so the r16 routing falls back to the cached
        # fold (fingerprint embeds the value)
        "SELECT segment, count(*) AS n FROM events_p "
        "JOIN p16_seg USING (user_id) "
        "WHERE value > (SELECT max(value) FROM events_p) / 2 "
        "GROUP BY 1 ORDER BY 1",
    )
    two_run(
        "nested_static_in_body_above_window",
        "SELECT k, n, rnk FROM (SELECT k, n, "
        "rank() OVER (ORDER BY n DESC, k) AS rnk FROM ("
        "SELECT event_type AS k, count(*) AS n FROM events_p "
        "WHERE event_type IN (SELECT event_type FROM events_p "
        "GROUP BY 1 HAVING count(*) > 2) GROUP BY event_type) a) b "
        "WHERE rnk <= 4 ORDER BY rnk, k",
    )
    two_run(
        "nested_static_under_full",
        # static scalar inside the WHERE of a FULL composite: the A half
        # carries the literal through its own fingerprint
        "SELECT big, count(ts) AS nf, count(*) AS n FROM events_p "
        "FULL JOIN p16_fdim ON event_type = et "
        "WHERE value > (SELECT min(value) FROM events_p) "
        "GROUP BY 1 ORDER BY 1",
    )
    # volatile mutants must stay passthrough but value-match
    two_run(
        "nested_volatile_refuses",
        "SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
        "FROM events_p WHERE value > "
        "(SELECT avg(value) FROM events_p WHERE ts < now()) "
        "GROUP BY event_type) t ORDER BY k",
        expect_cached=False,
    )

    # --- substring dedup boundaries (operator, not SQL) -------------------
    from datafusion_query_cache_spark.operators.dedup import substring_dedup
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        SubstringDedupIndex,
    )

    docs = spark.table("documents")
    corpus = spark.sql(
        "SELECT d.doc_id, concat(d.text, ' ', r.text) AS text "
        "FROM documents d JOIN documents r ON r.doc_id = d.doc_id % 50"
    )
    try:
        # window == doc length boundary, window 1, and empty-text docs
        tiny = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c"), (3, ""), (4, "a"), (5, "a")],
            "doc_id long, text string",
        )
        for w in (1, 3, 5):
            out = {r["doc_id"]: r["n_kept"] for r in
                   substring_dedup(tiny, window=w).collect()}
            # w=1: every token of doc2 and doc5 removed; w=3: doc2 wiped;
            # w=5: nothing collides (no doc has 5 tokens)
            if w == 1 and (out[2] != 0 or out[5] != 0 or out[1] != 3):
                failures.append(("substr_w1", str(out)))
            if w == 3 and (out[2] != 0 or out[1] != 3 or out[4] != 1):
                failures.append(("substr_w3", str(out)))
            if w == 5 and out != {1: 3, 2: 3, 3: 0, 4: 1, 5: 1}:
                failures.append(("substr_w5", str(out)))
        print("  substr_boundaries                        OK")
        # incremental ingest split exactly at a duplicate-span boundary
        ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
        idx = SubstringDedupIndex(
            tempfile.mkdtemp(prefix="qc-p16-sd-"), window=12
        )
        idx.update(corpus.filter(F.col("doc_id") <= ids[1]))
        idx.update(corpus.filter(F.col("doc_id") <= ids[2]))
        idx.update(corpus)
        got = norm(idx.output(spark).collect())
        exp = norm(substring_dedup(corpus, window=12).collect())
        if got != exp:
            failures.append(("substr_incr_tiny_waves", "mismatch"))
            print("  substr_incr_tiny_waves                   MISMATCH")
        else:
            print("  substr_incr_tiny_waves                   OK")
    except Exception as e:  # noqa: BLE001
        failures.append(("substr_ops", str(e)[:120]))
        print(f"  substr_ops ERROR {str(e)[:90]}")

    print()
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for n, m in failures:
            print(f"  {n}: {m}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

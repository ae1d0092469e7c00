"""Round-15 cross-feature probes: compose the r15 surfaces (the FULL
OUTER composite, NATURAL de-sugaring, the paragraph/packing operators'
ingest boundaries) with the standing machinery (dyn windows, HAVING,
USING merges, watermark advances) and compare every answer against plain
Spark on the same advancing two-run data. Four rounds of wrong-answer
classes fell out of this style of probing, not the ledger.

Usage: python tools/probe_r15_cross.py [sf_dir]
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

    spark = get_session(app="qc-probe-r15", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    hi = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    # ON dim (disjoint names) with holes on both sides
    spark.range(250).select(
        (F.col("id") + 700).alias("uid"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("fseg"),
    ).unionByName(
        spark.range(15).select(
            F.col("id").alias("uid"),
            F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias(
                "fseg"
            ),
        )
    ).createOrReplaceTempView("p15_dim")
    # USING dim (same key name), with holes
    spark.range(12).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("useg"),
    ).createOrReplaceTempView("p15_dimu")

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
                cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-p15-")),
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
                    f"  {name:36s} NOT CACHED: "
                    f"{(qc.last_decision.reason or '')[:60]}"
                )
                return
            if got != exp:
                failures.append((name, "value mismatch vs plain Spark"))
                print(f"  {name:36s} MISMATCH")
                return
            print(f"  {name:36s} OK (cached={cached})")
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:120]))
            print(f"  {name:36s} ERROR {str(e)[:80]}")

    # 1. FULL composite under a two-run refresh with BOTH unmatched sides
    two_run(
        "full_on_two_run",
        "SELECT fseg, count(ts) AS nf, count(*) AS n, "
        "round(sum(value), 2) AS sv FROM events_p "
        "FULL JOIN p15_dim ON user_id = uid GROUP BY 1 ORDER BY 1",
    )
    # 2. FULL + HAVING over merged states
    two_run(
        "full_having",
        "SELECT fseg, count(*) AS n FROM events_p "
        "FULL JOIN p15_dim ON user_id = uid GROUP BY 1 "
        "HAVING count(ts) > 10 AND avg(value) > 0 ORDER BY 1",
    )
    # 3. FULL USING with the MERGED key in group position
    two_run(
        "full_using_merged_key",
        "SELECT user_id % 5 AS ub, useg, count(ts) AS nf, count(*) AS n "
        "FROM events_p FULL JOIN p15_dimu USING (user_id) "
        "GROUP BY 1, 2 ORDER BY 1, 2",
    )
    # 4. NATURAL FULL (desugar + composite compose)
    two_run(
        "natural_full",
        "SELECT useg, count(*) AS n FROM events_p "
        "NATURAL FULL JOIN p15_dimu GROUP BY 1 ORDER BY 1",
    )
    # 5. NATURAL LEFT two-run (desugar onto LEFT USING machinery)
    two_run(
        "natural_left_two_run",
        "SELECT useg, count(*) AS n FROM events_p "
        "NATURAL LEFT JOIN p15_dimu GROUP BY 1 ORDER BY 1",
    )
    # 6. FULL + avg (sum/count recomposition) + ORDER BY agg DESC
    two_run(
        "full_avg_order",
        "SELECT fseg, round(avg(value), 2) AS av FROM events_p "
        "FULL JOIN p15_dim ON user_id = uid GROUP BY 1 "
        "ORDER BY 2 DESC NULLS LAST, 1 LIMIT 4",
    )
    # 7. side-qualified USING key under FULL: must REFUSE (passthrough)
    two_run(
        "full_using_side_qualified",
        "SELECT u.user_id AS uu, count(*) AS n FROM events_p e "
        "FULL JOIN p15_dimu u USING (user_id) GROUP BY 1 ORDER BY 1",
        expect_cached=False,
    )
    # 8. CTE shadowing under NATURAL: must REFUSE the desugar (passthrough)
    two_run(
        "natural_cte_shadow",
        "WITH events_p AS (SELECT user_id, value FROM events_p "
        "WHERE value > 1) "
        "SELECT useg, count(*) AS n FROM events_p "
        "NATURAL JOIN p15_dimu GROUP BY 1 ORDER BY 1",
        expect_cached=False,
    )
    # 9. qualifier-column membership (the r15 fuzz find, ON-join edition):
    #    p15_dim.value is NOT a column of p15_dim — Spark refuses, the
    #    engine must too (strict_errors would surface an engine answer)
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-p15-")),
            default_temporal_column="ts",
            override_now_ns=cut_ns,
            strict_errors=True,
        ),
    )
    ev.createOrReplaceTempView("events_p")
    bad = (
        "SELECT fseg, count(*) AS n FROM events_p "
        "JOIN p15_dim ON user_id = uid WHERE p15_dim.value > 1 "
        "GROUP BY 1 ORDER BY 1"
    )
    sp_refused = en_refused = False
    try:
        spark.sql(bad).collect()
    except Exception:
        sp_refused = True
    try:
        qc.sql(bad).collect()
    except Exception:
        en_refused = True
    if sp_refused and en_refused:
        print(f"  {'qualifier_column_membership':36s} OK (both refuse)")
    else:
        failures.append(
            ("qualifier_column_membership", f"sp={sp_refused} en={en_refused}")
        )
        print(f"  {'qualifier_column_membership':36s} PARITY BREAK")

    # 10. paragraph-dedup ingest boundary: a batch split EXACTLY at a
    #     duplicated paragraph's first occurrence must keep the early copy
    from datafusion_query_cache_spark.operators.dedup import paragraph_dedup
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        ParagraphDedupIndex,
    )

    rows = [
        (1, "alpha\nshared"),
        (2, "beta"),
        (3, "shared\ngamma"),  # 'shared' first claimed by doc 1
        (4, "shared\nalpha"),
    ]
    pd_df = spark.createDataFrame(rows, "doc_id int, text string")
    idx = ParagraphDedupIndex(tempfile.mkdtemp(prefix="qc-p15-pd-"))
    idx.update(pd_df.filter(F.col("doc_id") <= 2))
    idx.update(pd_df)
    got = norm(idx.output(spark).collect())
    exp = norm(paragraph_dedup(pd_df).collect())
    if got == exp:
        print(f"  {'para_dedup_ingest_boundary':36s} OK")
    else:
        failures.append(("para_dedup_ingest_boundary", "mismatch"))
        print(f"  {'para_dedup_ingest_boundary':36s} MISMATCH")

    # 11. packing invariance across bucket counts on a ragged corpus
    from datafusion_query_cache_spark.operators.packing import pack_sequences

    ragged = spark.createDataFrame(
        [(i, "w " * (i % 13)) for i in range(1, 300)],
        "doc_id int, text string",
    )
    outs = [
        norm(pack_sequences(ragged, 64, n_buckets=nb).collect())
        for nb in (1, 5, 64)
    ]
    if outs[0] == outs[1] == outs[2]:
        print(f"  {'packing_bucket_invariance':36s} OK")
    else:
        failures.append(("packing_bucket_invariance", "bucket-dependent"))
        print(f"  {'packing_bucket_invariance':36s} MISMATCH")

    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        for n, r in failures:
            print(f"  {n}: {r}")
        return 1
    print("ALL OK (11 probes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

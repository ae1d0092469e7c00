"""Focused r18 measurement: replicate bench.py's protocol for the rows
touched this round, with job counts. Usage: python tools/measure_r18.py row1 row2 ...
Rows: contam, substr, paradedup, components, fo_warm
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    rows = sys.argv[1:]
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark.sources.tables import (
        get_session,
        register_testdata,
    )

    spark = get_session(app="qc-measure-r18", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    docs = spark.table("documents")

    jobcounts: dict[str, int] = {}

    def count_jobs(key, fn):
        sc = spark.sparkContext
        group = f"m-{key}-{time.monotonic_ns()}"
        sc.setJobGroup(group, key)
        try:
            out = fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        jobcounts[key] = len(sc.statusTracker().getJobIdsForGroup(group))
        return out

    def timed_median(key, fn, runs=3):
        els = []
        for i in range(runs):
            t0 = time.perf_counter()
            if i == runs - 1:
                count_jobs(key, fn)
            else:
                fn()
            els.append(time.perf_counter() - t0)
        med = sorted(els)[len(els) // 2]
        print(f"{key}: median={med:.3f} all={[round(e,3) for e in els]} jobs={jobcounts.get(key)}")

    if "contam" in rows:
        from datafusion_query_cache_spark.operators.incremental_contamination import (
            ContaminationIndex,
        )
        from datafusion_query_cache_spark.operators.textstats import (
            contamination_scores,
        )

        bench_docs = docs.filter(F.col("doc_id") % 7 == 0)
        corpus_docs = docs.filter(F.col("doc_id") % 7 != 0)
        contamination_scores(corpus_docs, bench_docs, k=8, hashed=True).count()
        timed_median(
            "op_contam_batch",
            lambda: contamination_scores(
                corpus_docs, bench_docs, k=8, hashed=True
            ).count(),
        )
        cuts = [
            int(docs.approxQuantile("doc_id", [q], 0.0)[0])
            for q in (0.7, 0.8, 0.9)
        ]
        ct_idx = ContaminationIndex(
            tempfile.mkdtemp(prefix="qc-m-ct-"), k=8, hashed=True
        )
        ct_idx.update(
            docs=corpus_docs.filter(F.col("doc_id") <= F.lit(cuts[0])),
            benchmark=bench_docs,
        )
        ct_steps = [
            corpus_docs.filter(F.col("doc_id") <= F.lit(cuts[1])),
            corpus_docs.filter(F.col("doc_id") <= F.lit(cuts[2])),
            corpus_docs,
        ]
        els = []
        for i, sub in enumerate(ct_steps):
            t0 = time.perf_counter()
            if i == len(ct_steps) - 1:
                count_jobs(
                    "op_incr_contam_update", lambda: ct_idx.update(docs=sub).count()
                )
            else:
                ct_idx.update(docs=sub).count()
            els.append(time.perf_counter() - t0)
        print(
            f"op_incr_contam_update: median={sorted(els)[1]:.3f} "
            f"all={[round(e,3) for e in els]} jobs={jobcounts.get('op_incr_contam_update')}"
        )

    if "substr" in rows:
        from datafusion_query_cache_spark.operators.dedup import substring_dedup
        from datafusion_query_cache_spark.operators.incremental_para_dedup import (
            SubstringDedupIndex,
        )

        timed_median(
            "op_substr_batch_full",
            lambda: substring_dedup(docs, window=12).agg(F.sum("n_kept")).collect(),
        )
        cuts = [
            int(docs.approxQuantile("doc_id", [q], 0.0)[0])
            for q in (0.7, 0.8, 0.9)
        ]
        sd_idx = SubstringDedupIndex(tempfile.mkdtemp(prefix="qc-m-sd-"), window=12)
        sd_idx.update(docs.filter(F.col("doc_id") <= F.lit(cuts[0])))
        steps = [
            docs.filter(F.col("doc_id") <= F.lit(cuts[1])),
            docs.filter(F.col("doc_id") <= F.lit(cuts[2])),
            docs,
        ]
        els = []
        for i, sub in enumerate(steps):
            t0 = time.perf_counter()
            if i == len(steps) - 1:
                count_jobs(
                    "op_incr_substr_update", lambda: sd_idx.update(sub).count()
                )
            else:
                sd_idx.update(sub).count()
            els.append(time.perf_counter() - t0)
        print(
            f"op_incr_substr_update: median={sorted(els)[1]:.3f} "
            f"all={[round(e,3) for e in els]} jobs={jobcounts.get('op_incr_substr_update')}"
        )

    if "paradedup" in rows:
        from datafusion_query_cache_spark.operators.incremental_para_dedup import (
            ParagraphDedupIndex,
        )

        cuts = [
            int(docs.approxQuantile("doc_id", [q], 0.0)[0])
            for q in (0.7, 0.8, 0.9)
        ]
        pd_idx = ParagraphDedupIndex(tempfile.mkdtemp(prefix="qc-m-pd-"), sep=" ")
        pd_idx.update(docs.filter(F.col("doc_id") <= F.lit(cuts[0])))
        steps = [
            docs.filter(F.col("doc_id") <= F.lit(cuts[1])),
            docs.filter(F.col("doc_id") <= F.lit(cuts[2])),
            docs,
        ]
        els = []
        for i, sub in enumerate(steps):
            t0 = time.perf_counter()
            if i == len(steps) - 1:
                count_jobs("op_incr_para_update", lambda: pd_idx.update(sub).count())
            else:
                pd_idx.update(sub).count()
            els.append(time.perf_counter() - t0)
        print(
            f"op_incr_para_update: median={sorted(els)[1]:.3f} "
            f"all={[round(e,3) for e in els]} jobs={jobcounts.get('op_incr_para_update')}"
        )

    if "fo" in rows:
        import datetime as dt

        from datafusion_query_cache_spark import (
            CachedSparkSession,
            ParquetQueryCache,
            QueryCacheConfig,
        )
        from datafusion_query_cache_spark.sources.tables import with_ns_shadow

        big = f"/tmp/qc-bench-events-x1000p2-{os.path.basename(SF_DIR.rstrip('/'))}"
        if not os.path.exists(os.path.join(big, "_SUCCESS")):
            raise SystemExit("run bench.py once first to build the x1000 table")
        bz = with_ns_shadow(spark.read.parquet(big), "ts")
        bz.createOrReplaceTempView("events_x1000")
        DAY_NS = 24 * 3600 * 10**9
        hi_ns = bz.agg(F.max("ts_ns")).collect()[0][0]
        cut_ns = hi_ns - 2 * DAY_NS
        FO_XK_SQL = (
            "SELECT c_mktsegment AS segment, count(ts) AS nf, count(*) AS n, "
            "round(sum(value), 2) AS sv FROM events_x1000 "
            "FULL JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1"
        )

        def fo_flow(timed_run: bool):
            qf = CachedSparkSession(
                spark,
                QueryCacheConfig(
                    cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-m-fo-")),
                    default_temporal_column="ts",
                    temporal_partition_columns={"ts": "d"},
                    override_now_ns=cut_ns,
                ),
            )
            qf.sql(FO_XK_SQL).collect()
            nows = [hi_ns - DAY_NS, hi_ns + 1]
            best = None
            for i, now_ns in enumerate(nows):
                qf.config.override_now_ns = now_ns
                call = lambda: qf.sql(FO_XK_SQL).collect()
                t0 = time.perf_counter()
                if timed_run and i == len(nows) - 1:
                    count_jobs("qc_fo_x1000_warm", call)
                else:
                    call()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            if timed_run:
                print(
                    f"qc_fo_x1000_warm: best={best:.3f} "
                    f"jobs={jobcounts.get('qc_fo_x1000_warm')}"
                )

        fo_flow(timed_run=False)
        fo_flow(timed_run=True)

    if "components" in rows:
        from datafusion_query_cache_spark.operators.components import near_dedup_keep
        from datafusion_query_cache_spark.operators.dedup import minhash_dedup_pairs
        from datafusion_query_cache_spark.operators.spread import _plan_size_bytes

        dd_pairs = minhash_dedup_pairs(docs, threshold=0.6).persist()
        dd_pairs.count()
        e = dd_pairs.select(
            F.col("id_a").alias("u"), F.col("id_b").alias("v")
        )
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        sym = sym.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
        print("sym stats bytes:", _plan_size_bytes(sym))
        near_dedup_keep(docs, dd_pairs).count()
        timed_median(
            "op_dedup_cluster_keep", lambda: near_dedup_keep(docs, dd_pairs).count()
        )
        dd_pairs.unpersist()


if __name__ == "__main__":
    main()

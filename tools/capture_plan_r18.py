"""Capture .explain('formatted') for named bench rows into plans/r18/.

Usage: python tools/capture_plan_r18.py <suffix> <row> [<row> ...]
Writes plans/r18/<row>_<suffix>.txt for each named row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")


def main() -> None:
    suffix = sys.argv[1]
    rows = sys.argv[2:]
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark.sources.tables import (
        get_session,
        register_testdata,
    )

    spark = get_session(app="qc-plan-capture", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    docs = spark.table("documents")

    def frame(row: str):
        if row == "op_contam_batch":
            from datafusion_query_cache_spark.operators.textstats import (
                contamination_scores,
            )

            bench_docs = docs.filter(F.col("doc_id") % 7 == 0)
            corpus_docs = docs.filter(F.col("doc_id") % 7 != 0)
            return contamination_scores(corpus_docs, bench_docs, k=8, hashed=True)
        if row == "op_substr_batch_full":
            from datafusion_query_cache_spark.operators.dedup import substring_dedup

            return substring_dedup(docs, window=12).agg(F.sum("n_kept"))
        if row == "op_minhash_pairs":
            from datafusion_query_cache_spark.operators.dedup import minhash_lsh_pairs

            return minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.6)
        if row == "op_minhash_x4":
            from datafusion_query_cache_spark.operators.dedup import minhash_lsh_pairs

            big = os.path.join(
                "/tmp",
                f"qc-bench-docs-x4-{os.path.basename(SF_DIR.rstrip('/'))}",
            )
            dx4 = spark.read.parquet(big)
            return minhash_lsh_pairs(dx4, num_hashes=64, bands=16, threshold=0.6)
        if row == "op_dedup_cluster_keep":
            from datafusion_query_cache_spark.operators.components import near_dedup_keep
            from datafusion_query_cache_spark.operators.dedup import minhash_dedup_pairs

            dd_pairs = minhash_dedup_pairs(docs, threshold=0.6)
            return near_dedup_keep(docs, dd_pairs)
        raise SystemExit(f"unknown row {row}")

    os.makedirs(OUT, exist_ok=True)
    for row in rows:
        df = frame(row)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{row}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {row}_{suffix}.txt")


if __name__ == "__main__":
    main()

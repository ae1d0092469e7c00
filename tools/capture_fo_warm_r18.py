"""Capture the qc_fo_x1000_warm refresh's job structure + final-merge plan.

Usage: QC_FO_EAGER_MERGE={0|1} python tools/capture_fo_warm_r18.py <suffix>
Writes plans/r18/qc_fo_x1000_warm_<suffix>.txt: the warm refresh's Spark
job list (from the status tracker) and the final merge's executed plan —
the artifact pair that shows the 12-job -> 8-job structural change (the
warm path is multi-action, so a single .explain cannot represent it).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18"
)


def main() -> None:
    suffix = sys.argv[1]
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.sources.tables import (
        get_session,
        register_testdata,
        with_ns_shadow,
    )

    spark = get_session(app="qc-fo-capture", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    big = f"/tmp/qc-bench-events-x1000p2-{os.path.basename(SF_DIR.rstrip('/'))}"
    bz = with_ns_shadow(spark.read.parquet(big), "ts")
    bz.createOrReplaceTempView("events_x1000")
    DAY_NS = 24 * 3600 * 10**9
    hi_ns = bz.agg(F.max("ts_ns")).collect()[0][0]
    cut_ns = hi_ns - 2 * DAY_NS
    FO = (
        "SELECT c_mktsegment AS segment, count(ts) AS nf, count(*) AS n, "
        "round(sum(value), 2) AS sv FROM events_x1000 "
        "FULL JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1"
    )
    qf = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(tempfile.mkdtemp(prefix="qc-cap-fo-")),
            default_temporal_column="ts",
            temporal_partition_columns={"ts": "d"},
            override_now_ns=cut_ns,
        ),
    )
    qf.sql(FO).collect()
    qf.config.override_now_ns = hi_ns - DAY_NS
    qf.sql(FO).collect()

    sc = spark.sparkContext
    qf.config.override_now_ns = hi_ns + 1
    sc.setJobGroup("focap", "warm")
    res = qf.sql(FO)
    rows = res.collect()
    sc.setLocalProperty("spark.jobGroup.id", None)
    st = sc.statusTracker()
    ids = sorted(st.getJobIdsForGroup("focap"))

    lines = [
        f"qc_fo_x1000_warm ({suffix}): QC_FO_EAGER_MERGE="
        f"{os.environ.get('QC_FO_EAGER_MERGE', '1')}",
        f"warm refresh Spark jobs: {len(ids)}",
    ]
    for jid in ids:
        ji = st.getJobInfo(jid)
        sids = ji.stageIds if ji else []
        descs = []
        for sid in sids:
            si = st.getStageInfo(sid)
            if si:
                descs.append(f"{si.name.splitlines()[0][:70]} [{si.numTasks} tasks]")
        lines.append(f"  job {jid}: " + " | ".join(descs))
    lines.append("")
    lines.append(f"result rows: {len(rows)}")
    lines.append("")
    lines.append("returned frame's executed plan (the user-action side):")
    lines.append(res._jdf.queryExecution().executedPlan().toString())

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"qc_fo_x1000_warm_{suffix}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote qc_fo_x1000_warm_{suffix}.txt jobs={len(ids)}")


if __name__ == "__main__":
    main()

"""Cross-feature probe: catalog-qualified tables × round-13 surfaces.

The r13 qualified-table work is fingerprint/parse plumbing; this drives
it through REALISTIC incremental ingest — a managed ``default.events_px``
table holding the early half, run 1 populates entries, an APPEND write
lands the late half, run 2 must serve warm and match plain Spark on the
full table. Combinations: FILTER aggregates, tuple distinct, set
operations, WITH, composite-key decorrelation, PIVOT, and the
default-ON approx-percentile sketch at its cardinality cap.

Exit 0 = every comparison matched and every query cached both runs.
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

T = "default.events_px"

PROBES = [
    (
        "q_filter_tuple",
        f"SELECT event_type, count(*) FILTER (WHERE value > 40) AS fc, "
        f"count(DISTINCT user_id, event_type) AS dt FROM {T} "
        f"GROUP BY event_type ORDER BY event_type",
    ),
    (
        "q_setop_cte",
        f"WITH base AS (SELECT event_type AS k, count(*) AS n FROM {T} "
        f"GROUP BY 1) SELECT k, n FROM base WHERE n > 1 UNION ALL "
        f"SELECT k, n FROM base WHERE n <= 1 ORDER BY k, n",
    ),
    (
        "q_corr_2key",
        f"SELECT event_type, count(*) AS n FROM {T} o WHERE value > "
        f"(SELECT avg(value) FROM {T} i WHERE i.event_type = o.event_type "
        f"AND i.user_id % 3 = o.user_id % 3) GROUP BY event_type "
        f"ORDER BY event_type",
    ),
    (
        "q_pivot",
        f"SELECT * FROM (SELECT event_type AS et, user_id % 2 AS par, "
        f"value FROM {T}) PIVOT (count(*) AS c, round(sum(value), 3) AS s "
        f"FOR (et, par) IN (('view', 0) AS v0, ('click', 1) AS c1))",
    ),
    (
        "q_except",
        f"SELECT event_type AS k, count(*) AS n FROM {T} GROUP BY 1 "
        f"EXCEPT SELECT event_type AS k, count(*) AS n FROM {T} "
        f"WHERE value > 1e18 GROUP BY 1 ORDER BY k",
    ),
    (
        "q_regr_having",
        f"SELECT event_type, round(regr_slope(value, user_id) + 1e-9, 6) "
        f"AS sl FROM {T} GROUP BY 1 HAVING count(*) > 2 ORDER BY 1",
    ),
]


def rows_set(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(
                    round(v, 6) + 0.0 if math.isfinite(v) else str(v)
                )
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


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

    spark = get_session(app="probe-r13-qual", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)

    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)

    spark.sql(f"DROP TABLE IF EXISTS {T}")
    base = ev.drop("ts_ns")
    base.filter(F.col("ts") < F.lit(cut)).write.mode("overwrite").saveAsTable(T)

    failures = []
    sessions = []
    for name, sql in PROBES:
        cdir = tempfile.mkdtemp(prefix=f"qc-probe-q-{name}-")
        cfg = QueryCacheConfig(
            cache=ParquetQueryCache(cdir),
            default_temporal_column="ts",
            strict_errors=True,
        )
        qc = CachedSparkSession(spark, cfg)
        cfg.override_now_ns = cut_ns
        try:
            qc.sql(sql).collect()
            d1 = qc.last_decision
            if not d1.cached:
                failures.append((name, f"run1 not cached: {d1.reason}"))
                continue
            sessions.append((name, sql, qc, cfg))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"run1 {type(e).__name__}: {e}"))

    # ingest the late half ONCE (append — the managed-table twin of a
    # streaming micro-batch landing), then run every probe's second leg
    base.filter(F.col("ts") >= F.lit(cut)).write.mode("append").saveAsTable(T)

    for name, sql, qc, cfg in sessions:
        cfg.override_now_ns = cut_ns + 10**17
        try:
            got = rows_set(qc.sql(sql).collect())
            d2 = qc.last_decision
            exp = rows_set(spark.sql(sql).collect())
            if not d2.cached:
                failures.append((name, f"run2 not cached: {d2.reason}"))
            elif got != exp:
                og = [r for r in got if r not in exp][:3]
                oe = [r for r in exp if r not in got][:3]
                failures.append(
                    (name, f"MISMATCH {len(got)}/{len(exp)} +{og} -{oe}")
                )
            else:
                print(f"OK   {name} ({len(got)} rows, hit2={d2.cache_hit})")
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"run2 {type(e).__name__}: {e}"))

    # sketch probe: default-ON approx_percentile past the exact-state cap
    cdir = tempfile.mkdtemp(prefix="qc-probe-q-sketch-")
    cfg = QueryCacheConfig(
        cache=ParquetQueryCache(cdir),
        default_temporal_column="ts",
        strict_errors=True,
        percentile_max_distinct=1,  # force every group past the exact cap
    )
    qc = CachedSparkSession(spark, cfg)
    sq = (
        f"SELECT event_type, approx_percentile(value, 0.5) AS p50 FROM {T} "
        f"GROUP BY 1 ORDER BY 1"
    )
    try:
        cfg.override_now_ns = cut_ns + 10**17
        got = qc.sql(sq).collect()
        d = qc.last_decision
        exact = {
            r["event_type"]: r["m"]
            for r in spark.sql(
                f"SELECT event_type, percentile(value, 0.5) AS m FROM {T} "
                f"GROUP BY 1"
            ).collect()
        }
        lo = min(v for v in exact.values())
        hi = max(v for v in exact.values())
        band = 3 * 0.01 * max(abs(lo), abs(hi), 1.0)
        bad = [
            (r["event_type"], r["p50"], exact[r["event_type"]])
            for r in got
            if abs(r["p50"] - exact[r["event_type"]])
            > 3 * 0.01 * max(abs(exact[r["event_type"]]), 1.0)
        ]
        if not d.cached:
            failures.append(("q_sketch_default", f"not cached: {d.reason}"))
        elif bad:
            failures.append(("q_sketch_default", f"outside 3eps band: {bad}"))
        else:
            print(f"OK   q_sketch_default ({len(got)} rows, band +-{band:.3g})")
    except Exception as e:  # noqa: BLE001
        failures.append(("q_sketch_default", f"{type(e).__name__}: {e}"))

    spark.sql(f"DROP TABLE IF EXISTS {T}")
    print()
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg[:400]}")
        return 1
    print(f"ALL OK ({len(PROBES) + 1} qualified cross probes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

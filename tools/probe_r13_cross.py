"""Cross-feature differential probe for the round-13 surfaces.

Each query combines TWO OR MORE features that landed (or changed) in
round 13 — struct-field refs, tuple distinct counts, regr_*, QUALIFY,
multi-column PIVOT, set-op trees, composite-key decorrelation,
catalog-qualified names — because single-feature spellings are already
pinned by tests and the fuzzer; interactions are where wrong answers
hide. Flow per query: two-run advancing-now over the events_split swap
(run 1 = early half, run 2 = full), run-2 answer compared
order-insensitively against plain ``spark.sql`` on the full table
(DuckDB for QUALIFY, which Spark cannot parse).

Exit 0 = every comparison matched AND every query that must cache did.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# (name, sql, must_cache, oracle) — oracle "spark" | "duckdb"
PROBES = [
    # struct field group key + FILTER aggregate + tuple distinct
    (
        "struct_filter_tuple",
        "SELECT meta.t, count(*) FILTER (WHERE value > 40) AS fc, "
        "count(DISTINCT user_id, event_type) AS dt FROM {T} GROUP BY meta.t",
        True,
        "spark",
    ),
    # struct field path under an alias + regr pair + having
    (
        "struct_regr_having",
        "SELECT e.meta.b AS b, round(regr_slope(value, user_id)+1e-9, 6) AS sl, "
        "regr_count(value, user_id) AS rc FROM {T} e GROUP BY e.meta.b "
        "HAVING count(*) > 2",
        True,
        "spark",
    ),
    # tuple distinct + FILTER clause on it + group alias reuse in ORDER BY
    (
        "tuple_filter_order",
        "SELECT event_type AS et, count(DISTINCT user_id, CAST(value AS INT)) "
        "FILTER (WHERE value < 90) AS d2 FROM {T} GROUP BY event_type "
        "ORDER BY et",
        True,
        "spark",
    ),
    # regr family inside a UNION ALL tree with a nested third leg
    (
        "regr_union_nested",
        "SELECT event_type, regr_count(value, user_id) AS rc FROM {T} "
        "WHERE value > 5 GROUP BY 1 UNION ALL "
        "SELECT event_type, regr_count(value, user_id) AS rc FROM {T} "
        "WHERE value <= 5 GROUP BY 1 UNION ALL "
        "SELECT event_type, count(*) AS rc FROM {T} GROUP BY 1",
        True,
        "spark",
    ),
    # EXCEPT over exact aggregates where one branch uses a struct key
    (
        "except_struct",
        "SELECT meta.t AS k, count(*) AS n FROM {T} GROUP BY meta.t "
        "EXCEPT SELECT event_type AS k, count(*) AS n FROM {T} "
        "WHERE value > 0 GROUP BY event_type",
        True,
        "spark",
    ),
    # INTERSECT of tuple-distinct branches
    (
        "intersect_tuple",
        "SELECT count(DISTINCT user_id, event_type) AS d FROM {T} "
        "WHERE value > 10 INTERSECT "
        "SELECT count(DISTINCT user_id, event_type) AS d FROM {T} "
        "WHERE value > 10 AND value < 1e9",
        True,
        "spark",
    ),
    # composite-key correlated scalar whose inner uses a struct field key
    (
        "corr_struct_key",
        "SELECT event_type, count(*) AS n FROM {T} o WHERE value > "
        "(SELECT avg(value) FROM {T} i WHERE i.meta.t = o.meta.t "
        "AND i.user_id % 3 = o.user_id % 3) GROUP BY event_type",
        True,
        "spark",
    ),
    # EXISTS with 2-key correlation + FILTER agg in the outer
    (
        "exists_2key_filter",
        "SELECT event_type, count(*) FILTER (WHERE value > 50) AS hi "
        "FROM {T} o WHERE EXISTS (SELECT 1 FROM {T} i WHERE "
        "i.event_type = o.event_type AND i.user_id = o.user_id AND "
        "i.value > 95) GROUP BY event_type",
        True,
        "spark",
    ),
    # multi-column PIVOT over a derived aggregate with a struct source col
    (
        "pivot_multi_struct",
        "SELECT * FROM (SELECT meta.t AS t, user_id % 2 AS par, value "
        "FROM {T}) PIVOT (count(*) AS c, round(sum(value), 3) AS s "
        "FOR (t, par) IN (('view', 0) AS v0, ('click', 1) AS c1))",
        True,
        "spark",
    ),
    # QUALIFY over a tuple-distinct aggregate (DuckDB oracle; DuckDB has
    # no multi-arg count(DISTINCT a, b) — its struct spelling
    # count(DISTINCT (a, b)) matches because both columns are non-null)
    (
        "qualify_tuple",
        "SELECT event_type, count(DISTINCT user_id, event_type) AS d, "
        "count(*) AS n FROM {T} GROUP BY event_type "
        "QUALIFY row_number() OVER (ORDER BY n DESC, event_type) <= 3",
        True,
        "duckdb:SELECT event_type, count(DISTINCT (user_id, event_type)) "
        "AS d, count(*) AS n FROM {T} GROUP BY event_type "
        "QUALIFY row_number() OVER (ORDER BY n DESC, event_type) <= 3",
    ),
    # QUALIFY + window ma over a struct-keyed daily rollup
    (
        "qualify_struct_ma",
        "SELECT meta.t AS t, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS n FROM {T} GROUP BY meta.t, 2 "
        "QUALIFY avg(n) OVER (PARTITION BY t ORDER BY d "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) > 1 ORDER BY t, d",
        True,
        "duckdb",
    ),
    # grouping sets with a struct field + tuple distinct
    (
        "gsets_struct_tuple",
        "SELECT meta.t AS t, event_type, count(DISTINCT user_id, "
        "event_type) AS d FROM {T} GROUP BY GROUPING SETS ((meta.t), "
        "(meta.t, event_type))",
        True,
        "spark",
    ),
    # CTE body feeding a set operation leg (CTE head inlined)
    (
        "cte_except",
        "WITH base AS (SELECT event_type AS k, count(*) AS n FROM {T} "
        "GROUP BY event_type) SELECT k, n FROM base WHERE n > 1",
        True,
        "spark",
    ),
    # scalar subquery over a joined inner + outer FILTER aggregate
    (
        "scalar_joined_filter",
        "SELECT event_type, count(*) FILTER (WHERE value > "
        "(SELECT avg(e.value) FROM {T} e JOIN nation n ON "
        "e.user_id % 25 = n.n_nationkey)) AS above FROM {T} "
        "GROUP BY event_type",
        True,
        "spark",
    ),
]


def rows_set(df):
    out = []
    for r in df.collect():
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(round(v, 6) if math.isfinite(v) else str(v))
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def duck_rows_set(con, sql):
    out = []
    for r in con.execute(sql).fetchall():
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(round(v, 6) if math.isfinite(v) else str(v))
            elif hasattr(v, "timestamp") and not isinstance(v, dt.date):
                row.append(v)
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

    spark = get_session(app="probe-r13", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)

    ev = spark.table("events").withColumn(
        "meta",
        F.struct(
            F.col("event_type").alias("t"),
            (F.col("user_id") % 5).alias("b"),
        ),
    )
    ev.createOrReplaceTempView("events_full_m")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)

    import duckdb

    con = duckdb.connect()
    pdf = ev.drop("meta", "ts_ns").toPandas()
    con.register("events_pd", pdf)
    # rebuild the struct duckdb-side
    con.execute(
        "CREATE VIEW events_m AS SELECT *, "
        "{'t': event_type, 'b': user_id % 5} AS meta FROM events_pd"
    )

    failures = []
    for name, tmpl, must_cache, oracle in PROBES:
        cdir = tempfile.mkdtemp(prefix=f"qc-probe-{name}-")
        cfg = QueryCacheConfig(
            cache=ParquetQueryCache(cdir),
            default_temporal_column="ts",
            strict_errors=True,
        )
        qc = CachedSparkSession(spark, cfg)
        sql = tmpl.replace("{T}", "events_split_m")
        try:
            ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView(
                "events_split_m"
            )
            cfg.override_now_ns = cut_ns
            qc.sql(sql).collect()
            d1 = qc.last_decision
            ev.createOrReplaceTempView("events_split_m")
            cfg.override_now_ns = cut_ns + 10**17
            got = rows_set(qc.sql(sql))
            d2 = qc.last_decision
            if must_cache and not (d1.cached and d2.cached):
                failures.append(
                    (name, f"expected cached; run1={d1.cached} "
                           f"run2={d2.cached} reason={d2.reason}")
                )
                continue
            if oracle == "spark":
                exp = rows_set(spark.sql(tmpl.replace("{T}", "events_full_m")))
            else:
                dtmpl = (
                    oracle.split(":", 1)[1] if ":" in oracle else tmpl
                )
                dsql = dtmpl.replace("{T}", "events_m")
                exp = duck_rows_set(con, dsql)
            if got != exp:
                only_got = [r for r in got if r not in exp][:3]
                only_exp = [r for r in exp if r not in got][:3]
                failures.append(
                    (name, f"MISMATCH got={len(got)} exp={len(exp)} "
                           f"+{only_got} -{only_exp}")
                )
            else:
                print(f"OK   {name} ({len(got)} rows, "
                      f"hit2={d2.cache_hit})")
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {e}"))

    print()
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg[:400]}")
        return 1
    print(f"ALL OK ({len(PROBES)} cross-feature probes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

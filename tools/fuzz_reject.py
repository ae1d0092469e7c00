"""Rejection-parity fuzzer: the engine must never INVENT semantics.

For every generated spelling we run plain Spark and the engine on the
same view and require:

* Spark ANSWERS  → engine answers THE SAME ROWS (cached or passthrough);
* Spark REFUSES  → engine raises too (its own refusal must surface
  Spark's analysis error via passthrough, never rows).

The generator mixes VALID queries with systematic INVALIDATING mutations
of the reference-resolution surface — the exact class three rounds of
wrong answers came from (alias hiding, scope leaks, side-qualified USING
keys, struct paths above derived tables):

  - refs qualified by an alias-HIDDEN table name (``FROM events e`` +
    ``events.value``)
  - refs qualified by a DERIVED-hidden inner alias/table
  - side-qualified USING keys (valid SQL, side-sensitive semantics — the
    engine must match Spark exactly, cached or not)
  - struct-path spellings above derived tables
  - qualifiers naming NO relation at all

Usage: python tools/fuzz_reject.py [trials] [seed] [sf_dir]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 80
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 20260816
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"


def main() -> int:
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        MemoryQueryCache,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.sources.tables import (
        get_session,
        register_testdata,
    )

    spark = get_session(app="qc-fuzz-reject", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    spark.sql(
        "SELECT DISTINCT user_id, concat('s', user_id % 4) AS segment "
        "FROM events"
    ).createOrReplaceTempView("rj_seg")
    # disjoint-named dim for FULL OUTER axes (same-named keys hit the
    # standing ambiguity refusal, which is parity-trivial)
    spark.sql(
        "SELECT DISTINCT user_id + 2 AS uid, concat('d', user_id % 3) "
        "AS dseg FROM events"
    ).createOrReplaceTempView("rj_dim")
    # a REAL column named like a select alias (the shadowed-alias axis)
    spark.sql(
        "SELECT *, user_id % 2 AS sh_col FROM events"
    ).createOrReplaceTempView("rj_shadow")

    rng = random.Random(SEED)
    aggs = ["count(*) AS n", "round(sum(value), 2) AS sv", "min(value) AS mn"]
    # (qualifier, column) candidates per shape; {A} = alias slot
    shapes = [
        # plain table, alias {A}: hidden-name + bogus qualifiers
        lambda q: (
            f"SELECT {q}.event_type AS g, {{ag}} FROM events {{A}} "
            f"GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT event_type AS g, {{ag}} FROM events {{A}} "
            f"WHERE {q}.value > 2 GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT event_type AS g, {{ag}} FROM events {{A}} "
            f"GROUP BY 1 ORDER BY {q}.event_type"
        ),
        # star wrapper: inner names must not leak out
        lambda q: (
            f"SELECT {q}.event_type AS g, {{ag}} FROM "
            f"(SELECT * FROM events) {{A}} GROUP BY 1 ORDER BY 1"
        ),
        # derived aggregate: struct-ish dotted refs above it
        lambda q: (
            f"SELECT {q}.n AS nn FROM (SELECT event_type, count(*) AS n "
            f"FROM events GROUP BY 1) {{A}} ORDER BY 1"
        ),
        # USING join: side-qualified keys (VALID SQL — exactness matters)
        lambda q: (
            f"SELECT {q}.user_id AS uu, {{ag}} FROM events e "
            f"LEFT JOIN rj_seg u USING (user_id) GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment, count({q}.user_id) AS nq FROM events e "
            f"LEFT JOIN rj_seg u USING (user_id) GROUP BY 1 ORDER BY 1"
        ),
        # outer modifiers above PIVOT / set operations (the r13 scope
        # surfaces): dotted refs must behave exactly like plain Spark
        lambda q: (
            "SELECT * FROM (SELECT event_type, user_id % 2 AS ub, value "
            "FROM events) PIVOT (count(*) FOR ub IN (0, 1)) "
            f"ORDER BY {q}.event_type"
        ),
        lambda q: (
            f"SELECT event_type AS g, {{ag}} FROM events WHERE value > 2 "
            "GROUP BY 1 UNION ALL "
            f"SELECT event_type AS g, {{ag}} FROM events WHERE value <= 2 "
            f"GROUP BY 1 ORDER BY {q}.g"
        ),
        # CTE shadowing a real view name: the CTE must win, like Spark
        lambda q: (
            f"WITH rj_seg AS (SELECT event_type, value FROM events "
            f"WHERE value > 1) "
            f"SELECT event_type AS g, {{ag}} FROM rj_seg GROUP BY 1 "
            f"ORDER BY 1"
        ),
        # r15 axes — the round's new reference-resolution surfaces:
        # NATURAL joins (desugar to USING: side-qualified keys, hidden
        # names, dotted refs must all track Spark exactly)
        lambda q: (
            f"SELECT {q}.user_id AS uu, {{ag}} FROM events e "
            f"NATURAL LEFT JOIN rj_seg u GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment, count({q}.user_id) AS nq FROM events e "
            f"NATURAL LEFT JOIN rj_seg u GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment AS g, {{ag}} FROM events {{A}} "
            f"NATURAL JOIN rj_seg WHERE {q}.value > 2 "
            f"GROUP BY 1 ORDER BY 1"
        ),
        # hidden names under a join spine (star-leaf de-sugar must not
        # resolve a wrapper-hidden or alias-hidden table name)
        lambda q: (
            f"SELECT segment AS g, count({q}.user_id) AS nq FROM "
            f"(SELECT * FROM events) {{A}} "
            f"JOIN rj_seg ON {q}.user_id = rj_seg.user_id "
            f"GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment AS g, {{ag}} FROM "
            f"(SELECT * FROM events WHERE value > 0) {{A}} "
            f"JOIN rj_seg USING (user_id) "
            f"GROUP BY 1 ORDER BY {q}.segment"
        ),
        # USING keys qualified by the DE-SUGARED wrapper alias (the
        # wrapper alias IS visible — Spark side-resolves through it)
        lambda q: (
            f"SELECT {q}.user_id AS uu, {{ag}} FROM "
            f"(SELECT * FROM events) w "
            f"LEFT JOIN rj_seg u USING (user_id) GROUP BY 1 ORDER BY 1"
        ),
        # RIGHT + USING composed (swap normalization + merged key), and
        # RIGHT above a star wrapper WITH inner WHERE (the r15 advice
        # wrong-answer shape: filter must NOT hoist above the spine)
        lambda q: (
            f"SELECT segment AS g, count({q}.user_id) AS nq FROM rj_seg "
            f"{{A}} RIGHT JOIN events USING (user_id) "
            f"GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment AS g, count({q}.user_id) AS nq FROM "
            f"(SELECT * FROM events WHERE value > 2) {{A}} "
            f"RIGHT JOIN rj_seg ON {q}.user_id = rj_seg.user_id "
            f"GROUP BY 1 ORDER BY 1"
        ),
        # CTE shadowing a view name under a NATURAL join: the de-sugar
        # must not resolve keys against the shadowed catalog schema
        lambda q: (
            f"WITH events AS (SELECT user_id, value FROM events "
            f"WHERE value > 1) "
            f"SELECT segment AS g, {{ag}} FROM events NATURAL JOIN rj_seg "
            f"GROUP BY 1 ORDER BY {q}.segment"
        ),
        # FULL OUTER composite (r15): valid spellings must value-match
        # plain Spark (retractions included); qualified mutations refuse
        lambda q: (
            f"SELECT dseg AS g, count({q}.value) AS nq FROM events "
            f"FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT dseg AS g, {{ag}} FROM events {{A}} "
            f"FULL OUTER JOIN rj_dim ON user_id = uid "
            f"WHERE {q}.value > 2 GROUP BY 1 ORDER BY 1"
        ),
        # FULL USING: merged key + side-qualified mutations
        lambda q: (
            f"SELECT {q}.user_id AS uu, {{ag}} FROM events e "
            f"FULL JOIN rj_seg u USING (user_id) GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment AS g, count({q}.user_id) AS nq FROM events e "
            f"FULL JOIN rj_seg u USING (user_id) GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment AS g, {{ag}} FROM events "
            f"NATURAL FULL JOIN rj_seg GROUP BY 1 ORDER BY {q}.segment"
        ),
        # r16 axes — FULL edge closing a star spine: valid spellings
        # must value-match (cached, retractions included); qualified
        # mutations and non-closing FULL edges track Spark exactly
        lambda q: (
            f"SELECT dseg AS g, segment, count({q}.value) AS nq FROM "
            f"events JOIN rj_seg USING (user_id) "
            f"FULL JOIN rj_dim ON user_id = uid GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        lambda q: (
            f"SELECT dseg AS g, {{ag}} FROM events {{A}} "
            f"LEFT JOIN rj_seg USING (user_id) "
            f"FULL JOIN rj_dim ON {q}.user_id = uid "
            f"GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT segment AS g, count({q}.dseg) AS nq FROM events "
            f"FULL JOIN rj_dim ON user_id = uid "
            f"JOIN rj_seg USING (user_id) GROUP BY 1 ORDER BY 1"
        ),
        # r16 axes — static-inner nested scalars (the literal fold) and
        # their mutants: the VALID spelling must value-match (cached);
        # qualified refs inside/around the nested body, volatile inners
        # and depth-3 bodies must track Spark exactly (parity)
        lambda q: (
            f"SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
            f"FROM events {{A}} WHERE value > "
            f"(SELECT avg(value) FROM events) GROUP BY event_type) t "
            f"ORDER BY 1"
        ),
        lambda q: (
            f"SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
            f"FROM events WHERE {q}.value > "
            f"(SELECT avg(value) FROM events) GROUP BY event_type) t "
            f"ORDER BY 1"
        ),
        lambda q: (
            f"SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
            f"FROM events WHERE value > "
            f"(SELECT avg({q}.value) FROM events u) GROUP BY event_type) t "
            f"ORDER BY 1"
        ),
        lambda q: (
            f"SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
            f"FROM events WHERE value > "
            f"(SELECT avg(value) FROM events WHERE ts < now()) "
            f"GROUP BY event_type) t ORDER BY {q}.n"
        ),
        lambda q: (
            f"SELECT count(*) AS n FROM events {{A}} WHERE user_id IN "
            f"(SELECT user_id FROM events WHERE value > "
            f"(SELECT avg({q}.value) FROM events z) "
            f"GROUP BY user_id HAVING count(*) > 1)"
        ),
        # static IN/EXISTS bodies inside a cached derived middle (fold),
        # with qualified mutations inside the nested body
        lambda q: (
            f"SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
            f"FROM events WHERE event_type IN "
            f"(SELECT {q}.event_type FROM events z GROUP BY 1 "
            f"HAVING count(*) > 5) GROUP BY event_type) t ORDER BY 1"
        ),
        lambda q: (
            f"SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
            f"FROM events {{A}} WHERE NOT EXISTS "
            f"(SELECT 1 FROM events z WHERE z.value > 1e12) "
            f"GROUP BY {q}.event_type) t ORDER BY 1"
        ),
        # r16 leniency find: GROUP BY alias resolution order — a select
        # alias SHADOWING a real column must refuse like Spark
        # (MISSING_AGGREGATION), pure aliases must answer identically
        lambda q: (
            "SELECT user_id % 3 AS sh_col, count(*) AS n FROM rj_shadow "
            "GROUP BY sh_col ORDER BY 1"
        ),
        lambda q: (
            "SELECT sh_col, count(*) AS n FROM rj_shadow "
            "GROUP BY sh_col ORDER BY 1"
        ),
        lambda q: (
            f"SELECT {q}.event_type AS g2, count(*) AS n FROM events {{A}} "
            "GROUP BY g2 ORDER BY 1"
        ),
        # r17 axes — FULL composite percentile / DISTINCT folds / moments:
        # valid spellings must value-match plain Spark (cached,
        # retractions included); qualified mutations track Spark exactly
        lambda q: (
            f"SELECT dseg AS g, round(median({q}.value) + 1e-9, 2) AS md, "
            f"count(*) AS n FROM events "
            f"FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT dseg AS g, round(percentile(value, 0.9) + 1e-9, 2) "
            f"AS p90, sum(DISTINCT {q}.user_id) AS sd FROM events {{A}} "
            f"FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT dseg AS g, round(skewness({q}.value) + 1e-9, 3) "
            f"AS sk, avg(DISTINCT user_id) AS ad FROM events "
            f"FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 1"
        ),
        # tuple count(DISTINCT a, b) on the composite (r17) + qualified
        # mutations; DISTINCT over an expression must stay passthrough
        lambda q: (
            f"SELECT dseg AS g, count(DISTINCT {q}.user_id, event_type) "
            f"AS d2, count(*) AS n FROM events {{A}} "
            f"FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 1"
        ),
        lambda q: (
            f"SELECT dseg AS g, sum(DISTINCT {q}.user_id + 1) AS sx "
            f"FROM events FULL JOIN rj_dim ON user_id = uid "
            f"GROUP BY 1 ORDER BY 1"
        ),
        # alias SHADOWING a real column inside a FULL composite: the
        # r16 scope rule must hold on the composite path too
        lambda q: (
            "SELECT user_id % 3 AS sh_col, count(*) AS n FROM rj_shadow "
            "FULL JOIN rj_dim ON user_id = uid "
            "GROUP BY sh_col ORDER BY 1"
        ),
        # moving-scalar nested MIDDLE (r17 pinned-permanent refusal):
        # a middle level filtered by a now()-bearing scalar must
        # PASSTHROUGH (never cache) and answer exactly like Spark —
        # state admitted under per-run thresholds must never be stored
        lambda q: (
            f"SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
            f"FROM events WHERE value > (SELECT avg({q}.value) "
            f"FROM events z WHERE z.ts < now()) "
            f"GROUP BY event_type) t ORDER BY 1"
        ),
        lambda q: (
            f"SELECT count(*) AS n FROM events {{A}} WHERE user_id IN "
            f"(SELECT user_id FROM events WHERE value > "
            f"(SELECT avg(value) + 0 * unix_millis(now()) FROM events) "
            f"GROUP BY user_id HAVING count({q}.value) > 1)"
        ),
        # FULL OUTER positional ORDER BY (r16 advice): out-of-range
        # ordinals must surface Spark's ORDER_BY_POS_OUT_OF_RANGE, never
        # Python negative indexing
        lambda q: (
            "SELECT dseg AS g, count(value) AS nq FROM events "
            "FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 0"
        ),
        lambda q: (
            "SELECT dseg AS g, count(value) AS nq FROM events "
            "FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 3"
        ),
        lambda q: (
            "SELECT dseg AS g, count(value) AS nq FROM events "
            "FULL JOIN rj_dim ON user_id = uid GROUP BY 1 ORDER BY 2, 1"
        ),
    ]
    quals = ["events", "e", "t", "u", "x", "rj_seg"]
    aliases = ["", "e", "t", "u"]

    failures = []
    answered_invalid = 0
    refused_valid = 0
    for trial in range(TRIALS):
        shape = rng.choice(shapes)
        q = rng.choice(quals)
        a = rng.choice(aliases)
        sql = shape(q).format(ag=rng.choice(aggs), A=a).replace("  ", " ")

        sp_rows = None
        sp_err = None
        try:
            sp_rows = sorted(tuple(r) for r in spark.sql(sql).collect())
        except Exception as ex:  # noqa: BLE001
            sp_err = str(ex)[:80]

        cache = (
            MemoryQueryCache()
            if rng.random() < 0.5
            else ParquetQueryCache(tempfile.mkdtemp(prefix="qc-rj-"))
        )
        qc = CachedSparkSession(
            spark,
            QueryCacheConfig(
                cache=cache,
                default_temporal_column="ts",
                strict_errors=True,
            ),
        )
        en_rows = None
        en_err = None
        try:
            en_rows = sorted(tuple(r) for r in qc.sql(sql).collect())
        except Exception as ex:  # noqa: BLE001
            en_err = str(ex)[:80]

        if sp_err is None and en_err is None:
            if sp_rows != en_rows:
                failures.append((trial, sql, "VALUE MISMATCH"))
        elif sp_err is not None and en_err is None:
            answered_invalid += 1
            failures.append(
                (trial, sql, f"engine ANSWERED invalid SQL (spark: {sp_err})")
            )
        elif sp_err is None and en_err is not None:
            refused_valid += 1
            failures.append(
                (trial, sql, f"engine ERRORED on valid SQL: {en_err}")
            )
        if (trial + 1) % 20 == 0:
            print(f"[{trial + 1}/{TRIALS}] failures={len(failures)}", flush=True)

    print()
    if failures:
        print(f"{len(failures)} FAILURES "
              f"(answered-invalid={answered_invalid}, "
              f"refused-valid={refused_valid})")
        for t, s, r in failures[:10]:
            print(f"  trial {t}: {r}\n    {s[:160]}")
        return 1
    print(f"ALL OK ({TRIALS} trials — rejection parity holds)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

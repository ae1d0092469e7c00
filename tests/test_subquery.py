"""Aggregate-inside-derived-table caching (r9 verdict item 4).

The reference's bottom-up optimizer rule rewrites Aggregate nodes wherever
they sit in the plan (``src/aggregate.rs:74-76``, ``README.md:124``); our
front-end lowers ``SELECT ... FROM (<aggregate>) x [WHERE] [ORDER] [LIMIT]``
to a SubquerySpec — inner aggregate cached (sharing the standalone query's
entry), outer shape replayed post-finalize over O(state) rows.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


def _two_run(qc, spark, sql):
    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
    qc.config.override_now_ns = cut_ns
    try:
        qc.sql(sql).collect()
        assert qc.last_decision.cached, qc.last_decision.reason
        ev.createOrReplaceTempView("events")
        qc.config.override_now_ns = mx + 10**9
        out = qc.sql(sql)
        assert qc.last_decision.cached and qc.last_decision.cache_hit
        return out
    finally:
        ev.createOrReplaceTempView("events")


# -- parsing ------------------------------------------------------------


def test_parse_subquery_shape():
    from datafusion_query_cache_spark.plans.ir import SubquerySpec
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        "SELECT h, n FROM (SELECT date_trunc('hour', ts) AS h, count(*) AS n "
        "FROM events GROUP BY 1) x WHERE n > 5 ORDER BY n DESC LIMIT 3"
    )
    assert isinstance(s, SubquerySpec)
    # the cache key is the INNER aggregate alone: identical to the
    # standalone query's spec, so they share one state entry
    inner = parse_query(
        "SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1"
    )
    assert s.inner.canon() == inner.canon()
    assert s.limit == 3 and s.predicate is not None and len(s.order_by) == 1


@pytest.mark.parametrize(
    "sql,msg",
    [
        (
            "SELECT n FROM (SELECT event_type, count(*) AS n "
            "FROM events GROUP BY 1) t WHERE sum(n) > 5",
            "aggregate in WHERE above",
        ),
        (
            "SELECT bogus FROM (SELECT event_type, count(*) AS n "
            "FROM events GROUP BY 1) t",
            "not produced",
        ),
        (
            "SELECT n FROM (SELECT event_type, count(*) AS n FROM events "
            "GROUP BY 1) t GROUP BY n",
            "GROUP BY above",
        ),
        (
            # a LIMIT inner can't inline (row multiplicity) and isn't an
            # aggregate either — keeps the old derived-path refusal
            "SELECT event_id FROM (SELECT event_id, value FROM events "
            "LIMIT 5) t",
            "not a plain aggregate",
        ),
    ],
)
def test_parse_subquery_unsupported(sql, msg):
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match=msg):
        parse_query(sql)


# -- behavior -----------------------------------------------------------


def test_subquery_warm_matches_plain(spark, qc_mem):
    sql = (
        "SELECT h, n, av FROM (SELECT date_trunc('hour', ts) AS h, "
        "count(*) AS n, round(avg(value) + 1e-9, 2) AS av FROM events "
        "GROUP BY 1) x WHERE n > 2 ORDER BY n DESC, h LIMIT 10"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_subquery_star_and_filter(spark, qc_mem):
    sql = (
        "SELECT * FROM (SELECT event_type, count(*) AS n, "
        "round(sum(value), 2) AS s FROM events GROUP BY 1) t WHERE n > 0"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_subquery_shares_entry_with_standalone(spark, qc_mem):
    inner = (
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1"
    )
    outer = f"SELECT n FROM ({inner}) t WHERE n >= 0"
    qc_mem.config.override_now_ns = None
    qc_mem.sql(outer).collect()
    assert qc_mem.last_decision.cached
    fp1 = qc_mem.last_decision.fingerprint
    qc_mem.sql(inner).collect()
    assert qc_mem.last_decision.cached and qc_mem.last_decision.cache_hit
    assert qc_mem.last_decision.fingerprint == fp1


def test_subquery_outer_volatile_passthrough(spark, qc_mem):
    # now() in the outer shape would evaluate at Spark execution time, not
    # the engine's pinned now — must stay passthrough, with right answers
    sql = (
        "SELECT d FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS n FROM events GROUP BY 1) t WHERE d < CAST(now() AS DATE)"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached is False
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_subquery_outer_reaggregation(spark, qc_mem):
    """Two-level rollup: outer GROUP BY + aggregates over the cached inner
    aggregate run as plain ops over the finalized O(state) result."""
    sql = (
        "SELECT event_type, sum(n) AS total, max(n) AS peak FROM "
        "(SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS n FROM events GROUP BY 1, 2) x "
        "GROUP BY 1 HAVING sum(n) > 10 ORDER BY sum(n) DESC, event_type"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_subquery_outer_global_agg(spark, qc_mem):
    sql = (
        "SELECT count(*) AS days, max(n) AS peak FROM "
        "(SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events GROUP BY 1) t"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_cte_lowered_like_subquery(spark, qc_mem):
    sql = (
        "WITH agg AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1) "
        "SELECT event_type, n FROM agg WHERE n > 5 ORDER BY n DESC"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))
    # CTE and derived-table forms share the same inner fingerprint
    from datafusion_query_cache_spark.plans.parser import parse_query

    s1 = parse_query(sql)
    s2 = parse_query(
        "SELECT event_type, n FROM (SELECT event_type, count(*) AS n "
        "FROM events GROUP BY 1) agg WHERE n > 5 ORDER BY n DESC"
    )
    assert s1.inner.canon() == s2.inner.canon()


def test_cte_unsupported_shapes():
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match="head of the FROM"):
        parse_query(
            "WITH a AS (SELECT event_type, count(*) n FROM events GROUP BY 1) "
            "SELECT e.event_id FROM events e"
        )


def test_chained_cte_and_nested_derived_tables(spark, qc_mem):
    """Chains lower to NESTED SubquerySpecs: only the innermost aggregate
    is cached; each level above replays as plain ops."""
    chain = (
        "WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) "
        "AS d, count(*) AS n FROM events GROUP BY 1, 2), "
        "busy AS (SELECT event_type, d, n FROM daily WHERE n > 2) "
        "SELECT event_type, sum(n) AS total, count(*) AS busy_days "
        "FROM busy GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, chain)
    assert rows_set(out) == rows_set(spark.sql(chain))

    nested = (
        "SELECT et, total FROM (SELECT event_type AS et, sum(n) AS total "
        "FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS n FROM events GROUP BY 1, 2) i GROUP BY 1) o "
        "WHERE total > 10 ORDER BY total DESC"
    )
    out2 = _two_run(qc_mem, spark, nested)
    assert rows_set(out2) == rows_set(spark.sql(nested))

    # a dead (unreferenced) second CTE is ignored, not a rejection
    dead = (
        "WITH a AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1), "
        "b AS (SELECT count(*) AS m FROM events) "
        "SELECT event_type, n FROM a ORDER BY 1"
    )
    out3 = _two_run(qc_mem, spark, dead)
    assert rows_set(out3) == rows_set(spark.sql(dead))


# -- UNION of cacheable branches ----------------------------------------


def test_union_all_cached_branches(spark, qc_mem):
    sql = (
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS s "
        "FROM events WHERE value > 50 GROUP BY 1 "
        "UNION ALL "
        "SELECT event_type, count(*) AS n, round(sum(value), 2) AS s "
        "FROM events WHERE value <= 50 GROUP BY 1 ORDER BY 1, 2"
    )
    out = _two_run(qc_mem, spark, sql)
    assert "union of 2 cached branches" in qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_union_distinct_and_three_branches(spark, qc_mem):
    sql = (
        "SELECT event_type, count(*) AS n FROM events WHERE value > 80 GROUP BY 1 "
        "UNION ALL SELECT event_type, count(*) AS n FROM events "
        "WHERE value BETWEEN 20 AND 80 GROUP BY 1 "
        "UNION ALL SELECT event_type, count(*) AS n FROM events "
        "WHERE value < 20 GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 8"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))

    dsql = (
        "SELECT event_type FROM (SELECT event_type, count(*) AS n "
        "FROM events GROUP BY 1) a UNION SELECT event_type FROM "
        "(SELECT event_type, max(value) AS m FROM events GROUP BY 1) b"
    )
    out2 = _two_run(qc_mem, spark, dsql)
    assert rows_set(out2) == rows_set(spark.sql(dsql))


def test_union_branches_get_distinct_plans(spark, qc_mem):
    """Regression for the plan-cache key collision: both branches of a
    union share ONE query string, so plan caches keyed on the string
    reused branch 1's compiled plans for branch 2 and returned branch 1's
    rows twice. Keys are now the spec's canonical form."""
    sql = (
        "SELECT event_type, count(*) AS n FROM events WHERE value > 50 "
        "GROUP BY 1 UNION ALL SELECT event_type, count(*) AS n FROM events "
        "WHERE value <= 50 GROUP BY 1"
    )
    qc_mem.config.override_now_ns = None
    got = qc_mem.sql(sql)
    assert rows_set(got) == rows_set(spark.sql(sql))
    # the two branches must have produced DIFFERENT row groups
    rows = got.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["n"])
    assert all(len(set(v)) == len(v) for v in by_type.values()), by_type


def test_except_over_filter_branches_cached(spark, qc_mem):
    """EXCEPT legs are cacheable row sets over the temporal fact — served
    from state since r10 (was passthrough through r9)."""
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT event_type FROM events EXCEPT "
        "SELECT event_type FROM events WHERE value > 1000"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached
    assert "except of 2 cached branches" in qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


# -- dims joined above the derived aggregate ----------------------------


def test_parse_dim_join_above_derived():
    from datafusion_query_cache_spark.plans.ir import SubquerySpec
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        "SELECT n_name, n FROM (SELECT c_nationkey AS nk, count(*) AS n "
        "FROM customer GROUP BY 1) x JOIN nation ON nk = n_nationkey"
    )
    assert isinstance(s, SubquerySpec)
    assert len(s.join_steps) == 1 and s.join_steps[0].table == "nation"
    # the cache key stays the inner aggregate alone
    inner = parse_query(
        "SELECT c_nationkey AS nk, count(*) AS n FROM customer GROUP BY 1"
    )
    assert s.inner.canon() == inner.canon()


def test_parse_dim_join_unsupported():
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    # derived table on the RIGHT of a join: not left-deep → passthrough
    with pytest.raises(Unsupported):
        parse_query(
            "SELECT * FROM nation JOIN (SELECT c_nationkey AS nk, count(*) "
            "AS n FROM customer GROUP BY 1) x ON nk = n_nationkey"
        )


def _dim_two_run(qc, spark, sql):
    # orders is the append-only fact; customer/nation are static dims
    od = spark.table("orders")
    import datetime as dt

    cut = dt.datetime(1998, 1, 1)
    cut_ns = int(cut.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
    qc.config.default_temporal_column = "o_orderdate"
    od.filter(F.col("o_orderdate") < F.lit(cut)).createOrReplaceTempView("orders")
    qc.config.override_now_ns = cut_ns
    try:
        qc.sql(sql).collect()
        assert qc.last_decision.cached, qc.last_decision.reason
        od.createOrReplaceTempView("orders")
        qc.config.override_now_ns = cut_ns + 10**18
        out = qc.sql(sql)
        assert qc.last_decision.cached and qc.last_decision.cache_hit
        return out
    finally:
        od.createOrReplaceTempView("orders")
        qc.config.default_temporal_column = "ts"


def test_dim_join_project_matches_plain(spark, qc_mem):
    sql = (
        "SELECT n_name, m, n_orders FROM ("
        "SELECT o_custkey AS ck, CAST(date_trunc('month', o_orderdate) AS "
        "DATE) AS m, count(*) AS n_orders FROM orders GROUP BY 1, 2) x "
        "JOIN customer ON ck = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey"
    )
    out = _dim_two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_dim_join_reaggregation_matches_plain(spark, qc_mem):
    sql = (
        "SELECT n_name, sum(n_orders) AS n_orders FROM ("
        "SELECT o_custkey AS ck, count(*) AS n_orders FROM orders "
        "GROUP BY 1) x JOIN customer ON ck = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1"
    )
    out = _dim_two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_dim_left_join_keeps_agg_rows(spark, qc_mem):
    sql = (
        "SELECT c_mktsegment, n_orders FROM ("
        "SELECT o_custkey AS ck, count(*) AS n_orders FROM orders "
        "GROUP BY 1) x LEFT JOIN customer ON ck = c_custkey"
    )
    out = _dim_two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_cte_head_of_join_spine(spark, qc_mem):
    sql = (
        "WITH rollup AS (SELECT o_custkey AS ck, count(*) AS n_orders "
        "FROM orders GROUP BY 1) "
        "SELECT c_mktsegment, sum(n_orders) AS n FROM rollup "
        "JOIN customer ON ck = c_custkey GROUP BY 1 ORDER BY 1"
    )
    out = _dim_two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_dim_join_window_above(spark, qc_mem):
    # window referencing a DIM column after the join, over O(state) rows
    sql = (
        "SELECT n_name, n_orders, "
        "rank() OVER (PARTITION BY n_name ORDER BY n_orders DESC, ck) AS r "
        "FROM (SELECT o_custkey AS ck, count(*) AS n_orders FROM orders "
        "GROUP BY 1) x JOIN customer ON ck = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey"
    )
    out = _dim_two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_dim_join_ambiguous_column_passthrough(spark, qc_mem):
    # derived output name collides with a dim column: the parser drops
    # qualifiers, so resolving x.n_name unqualified would be WRONG — the
    # plan-time ambiguity check must force passthrough (where Spark's own
    # resolver honors the qualifiers)
    sql = (
        "SELECT x.n FROM (SELECT c_nationkey AS n_name, count(*) AS n "
        "FROM customer GROUP BY 1) x JOIN nation ON x.n_name = n_nationkey"
    )
    qc_mem.config.override_now_ns = None
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached is False
    assert "ambiguous" in qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


# -- EXCEPT / INTERSECT of cacheable branches -----------------------------


def test_except_cached_branches(spark, qc_mem):
    sql = (
        "SELECT event_type, count(*) AS n FROM events WHERE value > 5 "
        "GROUP BY 1 EXCEPT SELECT event_type, count(*) AS n FROM events "
        "WHERE value > 80 GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))
    assert "except of 2 cached branches" in qc_mem.last_decision.reason


def test_except_all_cached_branches(spark, qc_mem):
    sql = (
        "SELECT event_type FROM events WHERE value > 5 GROUP BY 1 "
        "HAVING count(*) > 10 EXCEPT ALL SELECT event_type FROM events "
        "WHERE value > 80 GROUP BY 1 HAVING count(*) > 100"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_intersect_cached_branches(spark, qc_mem):
    sql = (
        "SELECT event_type, min(value) AS mn FROM events WHERE value > 5 "
        "GROUP BY 1 INTERSECT SELECT event_type, min(value) AS mn FROM "
        "events WHERE value > 5 AND event_id >= 0 GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))
    assert "intersect of 2 cached branches" in qc_mem.last_decision.reason


def test_chained_except_cached(spark, qc_mem):
    """a EXCEPT b EXCEPT c arrives left-nested; r13 lowers the nested
    branch recursively — every leaf owns its cache entry, exact replay."""
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT event_type FROM events GROUP BY 1 HAVING count(*) > 5 "
        "EXCEPT SELECT event_type FROM events GROUP BY 1 "
        "HAVING count(*) > 100 EXCEPT SELECT event_type FROM events "
        "GROUP BY 1 HAVING count(*) > 200"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


# -- derived PROJECTION inlining (r14): FROM (SELECT <proj>) t -----------


def test_derived_projection_inlined_and_cached(spark, qc_mem):
    """Aggregate over a filtered derived projection: the projection
    inlines into the outer (push-up) and the rewritten single-table
    aggregate caches through the normal pipeline — two-run exact."""
    sql = (
        "SELECT t.g, count(*) AS n, round(sum(t.x), 2) AS sx FROM "
        "(SELECT event_type AS g, value * 2 AS x, ts FROM events "
        "WHERE value > 1) t GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_derived_projection_shares_inlined_entry(spark, qc_mem):
    """The inlined spelling and the direct single-table spelling are the
    same plan — they must share ONE cache entry."""
    qc_mem.config.override_now_ns = None
    direct = (
        "SELECT event_type AS g, count(*) AS n FROM events "
        "WHERE value > 1 GROUP BY 1 ORDER BY 1"
    )
    derived = (
        "SELECT g, count(*) AS n FROM "
        "(SELECT event_type AS g, ts FROM events WHERE value > 1) t "
        "GROUP BY 1 ORDER BY 1"
    )
    qc_mem.sql(direct).collect()
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    entries0 = set(qc_mem.config.cache._store)
    out = qc_mem.sql(derived)
    assert qc_mem.last_decision.cached and qc_mem.last_decision.cache_hit
    assert set(qc_mem.config.cache._store) == entries0
    assert rows_set(out) == rows_set(spark.sql(derived))


def test_derived_star_projection_inlined(spark, qc_mem):
    sql = (
        "SELECT event_type, count(*) AS n FROM "
        "(SELECT * FROM events WHERE value > 2) t GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_derived_projection_nested_two_levels(spark, qc_mem):
    sql = (
        "SELECT g, count(*) AS n FROM (SELECT g, x FROM "
        "(SELECT event_type AS g, value AS x, ts FROM events "
        "WHERE value > 1) u WHERE x < 4) t GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_derived_projection_renamed_temporal(spark, qc_mem):
    """The temporal column flows through a RENAME in the projection: the
    substituted outer date_trunc sees the real column."""
    sql = (
        "SELECT date_trunc('day', e_ts) AS d, count(*) AS n FROM "
        "(SELECT ts AS e_ts, value FROM events) t GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_derived_projection_refusals(spark, qc_mem):
    """Soundness edges: a ref qualified by the INNER table alias is
    invalid SQL (hidden by the wrapper) — must pass through so Spark's own
    error stays authoritative; volatile inner items never cache; DISTINCT
    inners keep the old derived path (multiplicity changes)."""
    qc_mem.config.override_now_ns = None
    with pytest.raises(Exception, match="UNRESOLVED|cannot be resolved"):
        qc_mem.sql(
            "SELECT b.value, count(*) AS n FROM "
            "(SELECT value FROM events b) t GROUP BY 1"
        ).collect()
    assert not qc_mem.last_decision.cached
    qc_mem.sql(
        "SELECT r, count(*) AS n FROM "
        "(SELECT rand() AS r, ts FROM events) t GROUP BY 1"
    ).collect()
    assert not qc_mem.last_decision.cached
    # DISTINCT inners do NOT inline (multiplicity changes) — but they DO
    # ride the derived-AGGREGATE path (key-set state, re-agg above), exact
    sql = (
        "SELECT event_type, count(*) AS n FROM "
        "(SELECT DISTINCT event_type, user_id FROM events) t "
        "GROUP BY 1 ORDER BY 1"
    )
    got = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_derived_star_desugar_with_outer_subquery(spark, qc_mem):
    """(SELECT * FROM t WHERE p) e is a pure de-sugaring — the visible
    scope is identical — so even outer CORRELATED subqueries survive the
    inline (r14 second half). Exact vs plain Spark."""
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT event_type, count(*) AS n FROM "
        "(SELECT * FROM events WHERE value > 0) e "
        "WHERE value > (SELECT avg(value) FROM events e2 "
        "WHERE e2.event_type = e.event_type GROUP BY e2.event_type) "
        "GROUP BY 1 ORDER BY 1"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_derived_star_desugar_leniency_guards(spark, qc_mem):
    """The de-sugaring must NOT make originally-invalid spellings start
    resolving (the r13 invented-semantics class): a source-name-qualified
    outer ref above an ANONYMOUS star wrapper is invalid SQL and must
    surface Spark's own error."""
    qc_mem.config.override_now_ns = None
    with pytest.raises(Exception, match="UNRESOLVED|cannot be resolved"):
        qc_mem.sql(
            "SELECT events.value, count(*) AS n FROM "
            "(SELECT * FROM events) GROUP BY 1"
        ).collect()
    assert not qc_mem.last_decision.cached
    # aliased wrapper + source-qualified ref: also invalid, also loud
    with pytest.raises(Exception, match="UNRESOLVED|cannot be resolved"):
        qc_mem.sql(
            "SELECT events.value, count(*) AS n FROM "
            "(SELECT * FROM events) e GROUP BY 1"
        ).collect()
    assert not qc_mem.last_decision.cached

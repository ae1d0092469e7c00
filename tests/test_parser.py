"""Parser unit tests: SQL → mini-IR (tests/ model per SURVEY §5.2)."""

from __future__ import annotations

import pytest

from datafusion_query_cache_spark.plans.ir import (
    AggCall,
    BinOp,
    Col,
    Func,
    Lit,
    Star,
    Unsupported,
)
from datafusion_query_cache_spark.plans.parser import parse_agg_query


def test_flagship_shape():
    spec = parse_agg_query(
        "SELECT date_trunc('hour', ts) AS h, round(avg(value), 2) AS a, count(*) AS n "
        "FROM events WHERE value > 1 GROUP BY 1 ORDER BY 1 DESC LIMIT 5"
    )
    assert spec.table == "events"
    assert [g.name for g in spec.group_by] == ["h"]
    g = spec.group_by[0].expr
    assert isinstance(g, Func) and g.name == "date_trunc"
    assert g.args[1] == Col("ts")
    assert [a.name for a in spec.aggregates] == ["a", "n"]
    assert spec.select_order == ("h", "a", "n")
    assert spec.order_by[0].desc
    assert spec.limit == 5
    assert isinstance(spec.predicate, BinOp)


def test_count_star_and_named_count():
    spec = parse_agg_query("SELECT count(*) AS n, count(value) AS nv FROM events")
    aggs = [a.expr for a in spec.aggregates]
    assert aggs[0] == AggCall("count", (Star(),))
    assert aggs[1] == AggCall("count", (Col("value"),))
    assert spec.group_by == ()


def test_between_desugars():
    spec = parse_agg_query(
        "SELECT count(*) AS n FROM events WHERE ts BETWEEN '2024-01-01' AND '2024-01-02'"
    )
    p = spec.predicate
    assert isinstance(p, BinOp) and p.op == "and"
    assert p.left.op == ">=" and p.right.op == "<="


def test_group_by_alias_and_expr():
    spec = parse_agg_query(
        "SELECT event_type, sum(value) AS s FROM events GROUP BY event_type"
    )
    assert spec.group_by[0].name == "event_type"
    spec2 = parse_agg_query(
        "SELECT date_trunc('day', ts) AS d, sum(value) AS s FROM events GROUP BY d"
    )
    assert spec2.group_by[0].name == "d"
    assert isinstance(spec2.group_by[0].expr, Func)


def test_distinct_flag():
    spec = parse_agg_query("SELECT count(DISTINCT user_id) AS u FROM events")
    assert spec.aggregates[0].expr.distinct


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT * FROM events",  # no aggregate
        "SELECT value FROM events",  # non-agg select
        # RIGHT over a composite left side can't re-anchor into a
        # left-deep chain (plain two-table RIGHT now swap-normalizes)
        "SELECT count(*) FROM events e JOIN part p ON e.event_id = p.p_partkey "
        "RIGHT JOIN orders o ON true",
        # FULL caches since r15 (composite plan), spine-closing since
        # r16 — but TWO FULL edges still refuse at parse:
        "SELECT count(*) FROM events e FULL JOIN part p "
        "ON e.event_id = p.p_partkey FULL JOIN orders o ON true",
        "SELECT count(*) FROM events e JOIN events e2 ON true",  # self-join
        "SELECT count(*) FROM (SELECT 1)",  # subquery
        "WITH x AS (SELECT 1) SELECT count(*) FROM x",  # CTE
        "SELECT DISTINCT event_type, count(*) FROM events GROUP BY 1",  # distinct
        "SELECT sum(value) OVER () FROM events",  # window
    ],
)
def test_unsupported_shapes(sql):
    with pytest.raises(Unsupported):
        parse_agg_query(sql)


def test_canon_stable_across_spellings():
    a = parse_agg_query("SELECT count(*) AS n FROM events WHERE value > 1")
    b = parse_agg_query("select COUNT(*) as n from events where value > 1")
    assert a.canon() == b.canon()


def test_canon_distinguishes_literals():
    # fingerprint granularity trap (SURVEY §4.4.3): different literal ⇒
    # different entry
    a = parse_agg_query("SELECT count(*) AS n FROM events WHERE value > 1")
    b = parse_agg_query("SELECT count(*) AS n FROM events WHERE value > 2")
    assert a.canon() != b.canon()


def test_reserved_alias_rejected():
    with pytest.raises(Unsupported):
        parse_agg_query("SELECT count(*) AS __qc0_cnt FROM events")


def test_inner_join_parses_into_tables_and_predicate():
    spec = parse_agg_query(
        "SELECT count(*) AS n FROM events e JOIN orders o ON e.user_id = o.o_custkey "
        "WHERE e.value > 1"
    )
    assert spec.tables == ("events", "orders")
    # the join condition folded into the predicate as an AND conjunct
    assert "o_custkey" in spec.canon() and "value" in spec.canon()


def test_ir_json_roundtrip():
    """Filter specs round-trip through JSON (the durable donor-index format
    for cross-session semantic subsumption)."""
    import decimal
    import json

    from datafusion_query_cache_spark.plans.ir import (
        BinOp, Case, Cast, Col, FilterSpec, Func, InList, IsNull, Lit,
        OrderItem, SelectItem, ir_from_json, ir_to_json,
    )

    spec = FilterSpec(
        table="events",
        predicate=BinOp(
            "and",
            BinOp(">", Col("value"), Lit(decimal.Decimal("1.50"), "DECIMAL(3,2)")),
            InList(Func("upper", (Col("event_type"),)), (Lit("A", "VARCHAR"),), negated=True),
        ),
        items=(
            SelectItem("event_id", Col("event_id")),
            SelectItem("b", Case(((IsNull(Col("value")), Lit(0, "INTEGER")),), Cast(Col("value"), "BIGINT"))),
        ),
        order_by=(OrderItem(Col("event_id"), desc=True, nulls_first=False),),
        limit=7,
    )
    blob = json.dumps(ir_to_json(spec))
    back = ir_from_json(json.loads(blob))
    assert back == spec
    assert back.canon() == spec.canon()


def test_silent_drop_audit_r11():
    """Clauses the duckdb JSON carries that the lowering previously
    IGNORED — each would have returned wrong results while claiming
    cached. All must degrade to passthrough (Unsupported)."""
    import pytest

    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    cases = [
        # direct QUALIFY lowers since r13, but only over select OUTPUTS —
        # a raw aggregate call inside the window spec still refuses
        # (restate through the alias: ORDER BY n)
        (
            "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
            "QUALIFY rank() OVER (ORDER BY count(*)) <= 2",
            "aggregate inside a window spec",
        ),
        # TABLESAMPLE on the base table (would aggregate the FULL table)
        (
            "SELECT event_type, count(*) AS n FROM events "
            "TABLESAMPLE BERNOULLI(10) GROUP BY 1",
            "TABLESAMPLE|SAMPLE",
        ),
        # DISTINCT ON: one row per target, not plain DISTINCT
        (
            "SELECT DISTINCT ON (event_type) event_type, value FROM events",
            "DISTINCT ON",
        ),
        # ordered aggregate: the list order is part of the result
        (
            "SELECT event_type, array_agg(value ORDER BY event_id) AS vs "
            "FROM events GROUP BY 1",
            "ORDER BY inside aggregate",
        ),
    ]
    for sql, msg in cases:
        with pytest.raises(Unsupported, match=msg):
            parse_query(sql)


def test_decision_recorded_before_failing_passthrough(spark, qc_mem):
    """A query beyond Spark itself (DISTINCT ON) fails in the passthrough,
    but last_decision must still carry the engine's reason."""
    import pytest

    with pytest.raises(Exception):
        qc_mem.sql(
            "SELECT DISTINCT ON (event_type) event_type, value FROM events"
        ).collect()
    d = qc_mem.last_decision
    assert d is not None and not d.cached and "DISTINCT ON" in d.reason


def test_group_by_alias_shadowing_real_column_refuses(spark, qc):
    """r16 leniency find: duckdb binds GROUP BY <name> to the select
    ALIAS, Spark resolves the REAL column first and refuses with
    MISSING_AGGREGATION when the select expression is unaggregated.
    With registered-view scopes membership is decidable: a shadowed
    alias must refuse (passthrough -> Spark's own error), a pure alias
    must substitute and cache."""
    import pytest as _pt

    from pyspark.sql import functions as F

    spark.sql(
        "SELECT *, user_id % 2 AS ub FROM events"
    ).createOrReplaceTempView("al_shadow")
    try:
        q = (
            "SELECT user_id % 3 AS ub, count(*) AS n FROM al_shadow "
            "GROUP BY ub ORDER BY 1"
        )
        with _pt.raises(Exception):
            qc.sql(q).collect()
        with _pt.raises(Exception):
            spark.sql(q).collect()
        # the REAL column under its own name still groups fine
        q2 = "SELECT ub, count(*) AS n FROM al_shadow GROUP BY ub ORDER BY 1"
        a = sorted(tuple(r) for r in qc.sql(q2).collect())
        assert qc.last_decision.cached
        assert a == sorted(tuple(r) for r in spark.sql(q2).collect())
        # pure (unshadowed) aliases substitute and cache, plain-col too
        q3 = (
            "SELECT event_type AS k2, count(*) AS n FROM events "
            "GROUP BY k2 ORDER BY 1"
        )
        a = sorted(tuple(r) for r in qc.sql(q3).collect())
        assert qc.last_decision.cached
        assert a == sorted(tuple(r) for r in spark.sql(q3).collect())
    finally:
        spark.catalog.dropTempView("al_shadow")

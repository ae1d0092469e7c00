"""ORDER BY aggregates that are not output columns.

``SELECT k FROM t GROUP BY k ORDER BY count(*) DESC [LIMIT n]`` — the
sort aggregate is planned as a hidden ``__qc_ord{i}`` item on the INNER
cached aggregate; a SubquerySpec wrapper orders on the hidden columns
and then projects them away (Catalyst fuses sort+project+limit into
TakeOrderedAndProject). Select aliases inside the order expression are
resolved first (``ORDER BY n * 2`` where n aliases count(*)).
"""

from __future__ import annotations

import pytest

from tests.conftest import rows_set
from tests.test_scalar_subquery import _two_run


def test_parse_hidden_order_wraps_subquery():
    from datafusion_query_cache_spark.plans.ir import SubquerySpec
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        "SELECT event_type FROM events GROUP BY 1 ORDER BY count(*) DESC"
    )
    assert isinstance(s, SubquerySpec)
    assert [a.name for a in s.inner.aggregates] == ["__qc_ord0"]
    assert [i.name for i in s.items] == ["event_type"]


def test_hidden_order_matches_plain(spark, qc_mem):
    sql = (
        "SELECT event_type FROM events GROUP BY 1 "
        "ORDER BY count(*) DESC, 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert out.columns == ["event_type"]
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]


def test_hidden_order_with_limit_matches_plain(spark, qc_mem):
    sql = (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY max(value) DESC, d LIMIT 5"
    )
    out = _two_run(qc_mem, spark, sql)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]


def test_order_alias_expression_resolved(spark, qc_mem):
    sql = (
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
        "ORDER BY n * 2 DESC, 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert out.columns == ["event_type", "n"]
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]


def test_verbatim_order_still_plain_aggspec():
    """ORDER BY restating a select item verbatim needs no hidden item —
    it stays a plain AggSpec (no SubquerySpec wrap)."""
    from datafusion_query_cache_spark.plans.ir import AggSpec
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
        "ORDER BY count(*) DESC"
    )
    assert isinstance(s, AggSpec)


def test_hidden_order_with_having(spark, qc_mem):
    """HAVING + un-selected aggregate sort key: plain Spark REJECTS this
    spelling (UNRESOLVED_COLUMN through the having-Project) while DuckDB
    and this engine accept it — compare against the equivalent derived-
    table spelling instead."""
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
        "HAVING count(*) > 3 ORDER BY sum(user_id) DESC, 1"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    twin = spark.sql(
        "SELECT event_type, n FROM (SELECT event_type, count(*) AS n, "
        "sum(user_id) AS o FROM events GROUP BY 1 HAVING count(*) > 3) "
        "ORDER BY o DESC, event_type"
    )
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in twin.collect()
    ]

"""COALESCE through the cached path (duckdb desugars it into its own
OPERATOR_COALESCE class rather than a FUNCTION node) — in aggregate
arguments, predicates, and group keys."""

from __future__ import annotations

from tests.conftest import rows_set
from tests.test_scalar_subquery import _two_run


def test_parse_coalesce():
    from datafusion_query_cache_spark.plans.ir import Func
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        "SELECT event_type, sum(coalesce(value, 0)) AS s FROM events "
        "GROUP BY 1"
    )
    (item,) = [a for a in s.aggregates if a.name == "s"]
    fns = [n for n in item.expr.walk() if isinstance(n, Func)]
    assert any(f.name == "coalesce" for f in fns)


def test_coalesce_in_aggregate_matches_plain(spark, qc_mem):
    sql = (
        "SELECT event_type, round(sum(coalesce(value, 0)), 2) AS s, "
        "count(*) AS n FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_coalesce_in_predicate_and_group_key(spark, qc_mem):
    sql = (
        "SELECT coalesce(event_type, 'none') AS t, count(*) AS n "
        "FROM events WHERE coalesce(value, 0) > 50 GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))

"""SELECT DISTINCT over the temporal fact — cached as a group-by whose
state is the key set plus one hidden count item (dropped at finalize).

``SELECT DISTINCT cols FROM t [WHERE]`` ≡ ``GROUP BY`` over all outputs,
so the distinct set is maintained incrementally like any rollup; the
hidden ``__qc_d`` count never appears in the output. DISTINCT over
aggregates / with GROUP BY / over joins stays passthrough.
"""

from __future__ import annotations

import pytest

from tests.conftest import rows_set
from tests.test_scalar_subquery import _two_run


def test_parse_distinct_lowers_to_groupby():
    from datafusion_query_cache_spark.plans.ir import AggSpec
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        "SELECT DISTINCT event_type, user_id FROM events WHERE value > 5"
    )
    assert isinstance(s, AggSpec)
    assert [g.name for g in s.group_by] == ["event_type", "user_id"]
    assert [a.name for a in s.aggregates] == ["__qc_d"]
    assert list(s.select_order) == ["event_type", "user_id"]


@pytest.mark.parametrize(
    "sql,msg",
    [
        ("SELECT DISTINCT * FROM events", "DISTINCT [*]"),
        (
            "SELECT DISTINCT event_type, count(*) FROM events GROUP BY 1",
            "DISTINCT with GROUP BY",
        ),
        (
            "SELECT DISTINCT count(*) FROM events",
            "DISTINCT over aggregates",
        ),
    ],
)
def test_parse_distinct_unsupported(sql, msg):
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match=msg):
        parse_query(sql)


def test_distinct_matches_plain(spark, qc_mem):
    sql = (
        "SELECT DISTINCT event_type, user_id % 10 AS b FROM events "
        "WHERE value > 50 ORDER BY 1, 2"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))
    assert out.columns == ["event_type", "b"]  # hidden __qc_d dropped


def test_distinct_with_limit_matches_plain(spark, qc_mem):
    sql = (
        "SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
        "ORDER BY 1 LIMIT 20"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_in_body_may_be_distinct(spark, qc_mem):
    sql = (
        "SELECT event_id, event_type FROM events WHERE event_type IN "
        "(SELECT DISTINCT event_type FROM events WHERE value > 300) "
        "ORDER BY event_id"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))

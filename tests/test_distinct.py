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


def test_joined_distinct_two_run(spark, qc_mem):
    """r13: SELECT DISTINCT over a star join — the key-set state rides the
    cached join pipeline (fact carries the temporal column; dims join
    before aggregation like any joined GROUP BY)."""
    from pyspark.sql import functions as F

    spark.table("events").select(
        F.col("event_type").alias("t_type")
    ).distinct().withColumn("t_weight", F.length("t_type") % 3).createOrReplaceTempView(
        "etype_dim2"
    )
    sql = (
        "SELECT DISTINCT t_weight, user_id % 5 AS ub FROM events "
        "JOIN etype_dim2 ON event_type = t_type ORDER BY 1, 2"
    )
    out = _two_run(qc_mem, spark, sql)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]

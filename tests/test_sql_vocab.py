"""Round-10 expression-vocabulary additions through the cached path:
EXTRACT/date_part/to_date (datetime scalars beyond date_trunc buckets)
and IS [NOT] DISTINCT FROM (null-safe comparison, Spark's <=>)."""

from __future__ import annotations

from tests.conftest import rows_set
from tests.test_scalar_subquery import _two_run


def test_extract_group_key_matches_plain(spark, qc_mem):
    sql = (
        "SELECT extract(hour FROM ts) AS h, count(*) AS n FROM events "
        "GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_date_part_group_key_matches_plain(spark, qc_mem):
    sql = (
        "SELECT date_part('dow', ts) AS dw, round(sum(value), 2) AS s "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_to_date_group_key_matches_plain(spark, qc_mem):
    sql = (
        "SELECT to_date(ts) AS d, count(*) AS n FROM events "
        "GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_is_distinct_from_predicate(spark, qc_mem):
    sql = (
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE event_type IS DISTINCT FROM 'click' GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_is_not_distinct_from_predicate(spark, qc_mem):
    sql = (
        "SELECT count(*) AS n FROM events "
        "WHERE event_type IS NOT DISTINCT FROM 'click'"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))

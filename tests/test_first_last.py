"""first()/last() time-series semantics through the cache (SURVEY §4.3 /
VERDICT r1 item 6): bare first(x)/last(x) rewrite onto the argmin/argmax
state with the configured temporal column as the ordering key; the two-arg
form takes an explicit key. Incremental refresh must reproduce the
full-table arg_min/arg_max exactly."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


SQL = (
    "SELECT event_type, first(value) AS first_v, last(value) AS last_v, "
    "count(*) AS n FROM events_fl GROUP BY 1 ORDER BY 1"
)
TRUTH = (
    "SELECT event_type, min_by(value, ts) AS first_v, max_by(value, ts) AS last_v, "
    "count(*) AS n FROM events GROUP BY 1 ORDER BY 1"
)


def _cut_ns(spark):
    return int(spark.table("events").approxQuantile("ts_ns", [0.5], 0.0)[0])


def test_first_last_incremental_matches_full(spark, qc):
    ev = spark.table("events")
    cut_ns = _cut_ns(spark)
    qc.config.override_now_ns = cut_ns
    ev.filter(F.col("ts_ns") < F.lit(cut_ns)).createOrReplaceTempView("events_fl")
    qc.sql(SQL).collect()
    assert qc.last_decision.cached, qc.last_decision.reason

    ev.createOrReplaceTempView("events_fl")
    qc.config.override_now_ns = cut_ns + 10**18
    got = qc.sql(SQL)
    assert qc.last_decision.cache_hit
    assert rows_set(got) == rows_set(spark.sql(TRUTH))


def test_first_last_explicit_order_arg(spark, qc):
    ev = spark.table("events")
    cut_ns = _cut_ns(spark)
    sql = (
        "SELECT event_type, first(event_id, value) AS cheapest, "
        "last(event_id, value) AS dearest FROM events_fl GROUP BY 1"
    )
    qc.config.override_now_ns = cut_ns
    ev.filter(F.col("ts_ns") < F.lit(cut_ns)).createOrReplaceTempView("events_fl")
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    ev.createOrReplaceTempView("events_fl")
    qc.config.override_now_ns = cut_ns + 10**18
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    truth = spark.sql(
        "SELECT event_type, min_by(event_id, value) AS cheapest, "
        "max_by(event_id, value) AS dearest FROM events GROUP BY 1"
    )
    assert rows_set(got) == rows_set(truth)


def test_collect_set_incremental_matches_full(spark, qc):
    ev = spark.table("events")
    cut_ns = _cut_ns(spark)
    sql = (
        "SELECT event_type, "
        "array_join(array_sort(collect_set(CAST(user_id AS VARCHAR))), ',') AS us "
        "FROM events_fl GROUP BY 1"
    )
    qc.config.override_now_ns = cut_ns
    ev.filter(F.col("ts_ns") < F.lit(cut_ns)).createOrReplaceTempView("events_fl")
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    ev.createOrReplaceTempView("events_fl")
    qc.config.override_now_ns = cut_ns + 10**18
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    truth = spark.sql(
        "SELECT event_type, "
        "array_join(array_sort(collect_set(CAST(user_id AS STRING))), ',') AS us "
        "FROM events GROUP BY 1"
    )
    assert rows_set(got) == rows_set(truth)

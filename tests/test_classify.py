"""Classifier unit tests — table-driven over SURVEY §2c's expression
vocabulary, including the reference's fixed bugs (BETWEEN, strictness flip).
"""

from __future__ import annotations

import pytest

from datafusion_query_cache_spark.plans.classify import (
    Verdict,
    classify,
    find_temporal_group_by,
)
from datafusion_query_cache_spark.plans.ir import Col, Func, Lit, SelectItem
from datafusion_query_cache_spark.plans.parser import parse_agg_query

TS = frozenset({"ts"})


def pred_of(sql_where: str):
    spec = parse_agg_query(f"SELECT count(*) AS n FROM events WHERE {sql_where}")
    return spec.predicate


@pytest.mark.parametrize(
    "where,verdict",
    [
        ("value > 1", Verdict.STABLE),
        ("ts > '2024-01-01'", Verdict.STABLE),  # static lower bound
        ("ts > '2024-01-01' AND event_type = 'click'", Verdict.STABLE),
        ("event_type LIKE 'a%'", Verdict.STABLE),
        ("value IS NOT NULL", Verdict.STABLE),
        ("NOT (value > 1)", Verdict.STABLE),
        ("value > 1 OR value < 0", Verdict.STABLE),  # improvement: stable OR
        ("ts BETWEEN '2024-01-01' AND '2024-02-01'", Verdict.STABLE),  # ref panics
        ("event_type IN ('a', 'b')", Verdict.STABLE),
        ("ts > now()", Verdict.FOUND),
        ("ts >= now()", Verdict.FOUND),
        ("now() < ts", Verdict.FOUND),  # flipped, strictness-preserving
        ("now() <= ts", Verdict.FOUND),
        ("ts > now() - INTERVAL 1 DAY", Verdict.FOUND),  # dynamic bound, arith over now()
        ("ts > current_timestamp", Verdict.FOUND),
        ("value > random()", Verdict.ABANDON),
        ("ts < now()", Verdict.ABANDON),  # upper bound on ts → not a lower bound
        # `now()` in a non-bound position: FOUND_NOW (ref: Eq recurses via
        # either, src/aggregate.rs:770-777) — still not cacheable downstream
        ("now() = ts", Verdict.FOUND_NOW),
        ("value > 1 AND ts > now()", Verdict.FOUND),
    ],
)
def test_classify_verdicts(where, verdict):
    assert classify(pred_of(where), TS).verdict is verdict


def test_classify_none_is_stable():
    assert classify(None, TS).verdict is Verdict.STABLE


def test_found_carries_bound_column_and_strictness():
    c = classify(pred_of("now() < ts"), TS)
    assert c.verdict is Verdict.FOUND
    # `now() < ts` ≡ `ts > now()` — strict (the reference inverted this,
    # src/aggregate.rs:754-757; SURVEY §4.4.4 says fix it)
    assert c.bound.column == "ts"
    assert c.bound.op == ">"
    c2 = classify(pred_of("now() <= ts"), TS)
    assert c2.bound.op == ">="


def gb(*items):
    return tuple(items)


def test_find_temporal_group_by():
    item = SelectItem("h", Func("date_trunc", (Lit("hour", "VARCHAR"), Col("ts"))))
    other = SelectItem("t", Col("event_type"))
    m, ok = find_temporal_group_by(gb(item, other), TS, frozenset({"date_trunc"}))
    assert ok and m is not None
    assert (m.output_name, m.granularity, m.column) == ("h", "hour", "ts")


def test_find_temporal_group_by_rejects_two_buckets():
    a = SelectItem("h", Func("date_trunc", (Lit("hour", "VARCHAR"), Col("ts"))))
    b = SelectItem("d", Func("date_trunc", (Lit("day", "VARCHAR"), Col("ts"))))
    m, ok = find_temporal_group_by(gb(a, b), TS, frozenset({"date_trunc"}))
    assert not ok


def test_non_temporal_column_not_matched():
    item = SelectItem("h", Func("date_trunc", (Lit("hour", "VARCHAR"), Col("other"))))
    m, ok = find_temporal_group_by(gb(item,), TS, frozenset({"date_trunc"}))
    assert ok and m is None


# -- volatile functions in cached OUTPUT positions (r12 wrong-answer fix) --


def test_volatile_in_select_items_refused(spark, qc_mem):
    """A volatile value inside an aggregate argument would be FROZEN into
    the stored partial state at run-1's now and merged stale forever
    (found live: the 'recent sum' dashboard below returned NULLs on warm
    reads). Every volatile output position must refuse to cache;
    passthrough answers stay correct because plain Spark re-evaluates
    now() per run."""
    import datetime as dt

    from pyspark.sql import functions as F

    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    day = 24 * 3600 * 10**9
    q = (
        "SELECT event_type, round(sum(CASE WHEN ts > now() - INTERVAL 5 DAY "
        "THEN value END), 2) AS s FROM events GROUP BY 1 ORDER BY 1"
    )
    qc_mem.config.override_now_ns = mx - 10 * day
    qc_mem.sql(q).collect()
    assert not qc_mem.last_decision.cached
    assert "volatile function now" in qc_mem.last_decision.reason
    # and therefore the second run (advanced now) is CORRECT
    qc_mem.config.override_now_ns = None
    got = {r[0]: r[1] for r in qc_mem.sql(q).collect()}
    exp = {r[0]: r[1] for r in spark.sql(q).collect()}
    assert got == exp


@pytest.mark.parametrize(
    "sql",
    [
        # volatile in a filter-query select item (row-set state)
        "SELECT event_id, now() AS t FROM events WHERE value > 10",
        # volatile order key
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
        "ORDER BY random()",
        # volatile group key
        "SELECT current_date() AS d, count(*) AS n FROM events GROUP BY 1",
    ],
)
def test_volatile_positions_refused(qc_mem, sql):
    qc_mem.config.override_now_ns = None
    qc_mem.sql(sql).collect()
    assert not qc_mem.last_decision.cached
    assert "volatile function" in qc_mem.last_decision.reason


def test_dynamic_bound_predicate_still_cached(spark, qc_mem):
    """The guard must NOT touch predicates — now() there is the dynamic
    lower bound the classifier owns."""
    qc_mem.config.override_now_ns = None
    qc_mem.sql(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events WHERE ts > now() - INTERVAL 10 DAY GROUP BY 1"
    ).collect()
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason

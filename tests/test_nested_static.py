"""Static-inner nested scalar subqueries (r16): the middle level of a
nested-subquery chain is CACHED when the innermost scalar is static
(uncorrelated, volatile-free, subquery-free) — the session folds its
plan-time value as a literal, so the middle's fingerprint embeds the
value and state can never mix admission thresholds.

Everything non-static stays refused (passthrough): volatile inners,
depth-3 chains, correlated inners — pinned here and fuzzed by the
nested axes in tools/fuzz_reject.py."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set

MIDDLE = (
    "SELECT k, n, s FROM (SELECT event_type AS k, count(*) AS n, "
    "round(sum(value), 2) AS s FROM {v} "
    "WHERE value > (SELECT avg(value) FROM {v}) "
    "GROUP BY event_type) t ORDER BY k"
)


@pytest.fixture()
def split(spark):
    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    yield ev, cut_us * 1000, cut
    spark.catalog.dropTempView("ev_ns16")


def test_two_run_exact_inner_value_moves(qc, spark, split):
    """The critical soundness case: the inner avg CHANGES between runs
    (data growth). Run 2 must be exact vs plain on the full data — a
    threshold-mixing bug would fold run-1 state admitted under the OLD
    avg into run-2's answer."""
    ev, cut_ns, cut = split
    sql = MIDDLE.format(v="ev_ns16")
    ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("ev_ns16")
    qc.config.override_now_ns = cut_ns
    r1 = qc.sql(sql)
    assert qc.last_decision.cached
    assert rows_set(r1) == rows_set(spark.sql(sql))  # exact on the subset

    ev.createOrReplaceTempView("ev_ns16")
    qc.config.override_now_ns = cut_ns + 10**17
    # the inner value genuinely moved, else this test pins nothing
    sub_avg = ev.filter(F.col("ts") < F.lit(cut)).agg(F.avg("value")).first()[0]
    full_avg = ev.agg(F.avg("value")).first()[0]
    assert sub_avg != full_avg
    r2 = qc.sql(sql)
    assert qc.last_decision.cached
    assert rows_set(r2) == rows_set(spark.sql(sql))


def test_hot_rerun_hits(qc, spark, split):
    ev, cut_ns, cut = split
    ev.createOrReplaceTempView("ev_ns16")
    sql = MIDDLE.format(v="ev_ns16")
    qc.config.override_now_ns = cut_ns + 10**17
    qc.sql(sql).collect()
    r2 = qc.sql(sql)
    assert qc.last_decision.cache_hit
    assert rows_set(r2) == rows_set(spark.sql(sql))


def test_in_body_static_inner_cached(qc, spark):
    q = (
        "SELECT count(*) AS n FROM events WHERE user_id IN "
        "(SELECT user_id FROM events WHERE value > "
        "(SELECT avg(value) FROM events) "
        "GROUP BY user_id HAVING count(*) > 1)"
    )
    got = rows_set(qc.sql(q))
    assert qc.last_decision.cached
    assert got == rows_set(spark.sql(q))


def test_scalar_in_scalar_body_cached(qc, spark):
    q = (
        "SELECT count(*) AS n FROM events WHERE value > "
        "(SELECT avg(value) FROM events WHERE value > "
        "(SELECT min(value) FROM events))"
    )
    got = rows_set(qc.sql(q))
    assert qc.last_decision.cached
    assert got == rows_set(spark.sql(q))


@pytest.mark.parametrize(
    "inner",
    [
        # volatile: value moves EVERY run — embedded literal would orphan
        "(SELECT avg(value) FROM events WHERE ts < now())",
        # depth-3: subquery inside the static body
        "(SELECT avg(value) FROM events WHERE value > "
        "(SELECT min(value) FROM events))",
    ],
)
def test_non_static_inner_refuses_but_matches(qc, spark, inner):
    q = (
        "SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
        f"FROM events WHERE value > {inner} "
        "GROUP BY event_type) t ORDER BY k"
    )
    got = rows_set(qc.sql(q))
    assert not qc.last_decision.cached  # passthrough
    assert got == rows_set(spark.sql(q))


def test_in_and_exists_static_in_middle(qc, spark):
    """r16 extension: static IN and EXISTS bodies fold too (IN-list /
    boolean literals with exact SQL NULL semantics, mirroring the
    top-level folds), keeping the middle cached."""
    q = (
        "SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
        "FROM events WHERE event_type IN "
        "(SELECT event_type FROM events GROUP BY 1 HAVING count(*) > 5) "
        "AND EXISTS (SELECT event_type FROM events "
        "GROUP BY 1 HAVING count(*) > 5) "
        "AND NOT EXISTS (SELECT event_type FROM events "
        "GROUP BY 1 HAVING count(*) > 1000000) "
        "GROUP BY event_type) t ORDER BY k"
    )
    got = rows_set(qc.sql(q))
    assert qc.last_decision.cached, qc.last_decision.reason
    assert got == rows_set(spark.sql(q))


def test_volatile_in_body_refuses(qc, spark):
    q = (
        "SELECT k, n FROM (SELECT event_type AS k, count(*) AS n "
        "FROM events WHERE event_type IN "
        "(SELECT event_type FROM events WHERE ts < now() "
        "GROUP BY 1 HAVING count(*) > 5) "
        "GROUP BY event_type) t ORDER BY k"
    )
    got = rows_set(qc.sql(q))
    assert not qc.last_decision.cached
    assert got == rows_set(spark.sql(q))


@pytest.fixture()
def nseg(spark):
    spark.sql(
        "SELECT DISTINCT user_id, concat('s', user_id % 4) AS segment "
        "FROM events WHERE user_id % 3 != 0"
    ).createOrReplaceTempView("ns_seg")
    spark.sql(
        "SELECT DISTINCT event_type AS et, upper(event_type) AS big "
        "FROM events UNION ALL SELECT concat('g', CAST(id AS STRING)), "
        "concat('G', CAST(id AS STRING)) FROM range(3)"
    ).createOrReplaceTempView("ns_fdim")
    yield
    spark.catalog.dropTempView("ns_seg")
    spark.catalog.dropTempView("ns_fdim")


def test_static_scalar_with_star_join_outer_cached(qc, spark, nseg):
    """r16 routing fallback: _plan_scalar_outer cannot assemble joined
    outers, so a star-join outer with ONLY static subqueries falls to
    the cached fold path instead of passthrough."""
    q = (
        "SELECT segment, count(*) AS n FROM events "
        "JOIN ns_seg USING (user_id) "
        "WHERE value > (SELECT max(value) FROM events) / 2 "
        "GROUP BY 1 ORDER BY 1"
    )
    got = rows_set(qc.sql(q))
    assert qc.last_decision.cached, qc.last_decision.reason
    assert got == rows_set(spark.sql(q))


def test_static_scalar_under_full_composite_cached(qc, spark, nseg):
    q = (
        "SELECT big, count(ts) AS nf, count(*) AS n FROM events "
        "FULL JOIN ns_fdim ON event_type = et "
        "WHERE value > (SELECT min(value) FROM events) "
        "GROUP BY 1 ORDER BY 1"
    )
    got = rows_set(qc.sql(q))
    assert qc.last_decision.cached, qc.last_decision.reason
    assert qc.last_decision.refresh_tier == "full_outer"
    assert got == rows_set(spark.sql(q))


def test_in_fold_under_window_replay_cached(qc, spark):
    """The fold survives a nested-derived replay level (window above the
    cached aggregate): _derived_scalar_fold_ok recurses through clean
    SubquerySpec levels down to the folding AggSpec."""
    q = (
        "SELECT k, n, rnk FROM (SELECT k, n, "
        "rank() OVER (ORDER BY n DESC, k) AS rnk FROM ("
        "SELECT event_type AS k, count(*) AS n FROM events "
        "WHERE event_type IN (SELECT event_type FROM events "
        "GROUP BY 1 HAVING count(*) > 2) GROUP BY event_type) a) b "
        "WHERE rnk <= 4 ORDER BY rnk, k"
    )
    got = rows_set(qc.sql(q))
    assert qc.last_decision.cached, qc.last_decision.reason
    assert got == rows_set(spark.sql(q))

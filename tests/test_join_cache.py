"""Cached aggregates over star joins (append-only fact ⋈ static dims).

The reference caches any plan shape under its aggregate node — including
joins (README.md:124 'analyses queries (including subqueries)'); here the
join is rebuilt as crossJoin + predicate and Catalyst recovers the hash
joins, so join conditions classify and fingerprint like WHERE conjuncts."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture()
def split(spark):
    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)

    # a small static dim keyed by user_id bucket
    spark.range(100).select(
        F.col("id").alias("bucket_id"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("segment"),
    ).createOrReplaceTempView("user_seg")

    def run1():
        ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events_j")

    def run2():
        ev.createOrReplaceTempView("events_j")

    yield run1, run2, cut_ns
    spark.catalog.dropTempView("events_j")
    spark.catalog.dropTempView("user_seg")


JOIN_SQL = (
    "SELECT s.segment, date_trunc('day', e.ts) AS d, count(*) AS n, "
    "round(sum(e.value), 2) AS sv "
    "FROM events_j e JOIN user_seg s ON e.user_id % 100 = s.bucket_id "
    "WHERE e.value > 0 GROUP BY 1, 2 ORDER BY 1, 2"
)


def test_join_aggregate_cached_incrementally(spark, qc, split):
    run1, run2, cut_ns = split
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(JOIN_SQL).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    assert not qc.last_decision.cache_hit

    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(JOIN_SQL)
    assert qc.last_decision.cache_hit
    assert rows_set(got) == rows_set(spark.sql(JOIN_SQL))


def test_join_recovers_hash_join_plan(spark, qc, split):
    """crossJoin + filter must plan as a real equi-join, not a cartesian."""
    run1, run2, cut_ns = split
    run2()
    qc.config.override_now_ns = cut_ns

    qc.sql(JOIN_SQL).collect()
    plan = qc.last_refresh_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_ambiguous_join_columns_passthrough(spark, qc):
    # events joined with itself-shaped table would repeat column names
    df = qc.sql(
        "SELECT count(*) AS n FROM events e JOIN lineitem l "
        "ON e.event_id = l.l_orderkey JOIN orders o ON l.l_orderkey = o.o_orderkey"
    )
    # no ambiguity here (disjoint names) → cacheable; self-join IS rejected
    qc.sql(
        "SELECT count(*) AS n FROM events e1 JOIN events e2 "
        "ON e1.event_id = e2.event_id"
    )
    assert not qc.last_decision.cached
    assert "self-join" in qc.last_decision.reason


def test_right_join_nonbase_passthrough(qc, spark):
    df = qc.sql(
        "SELECT count(*) AS n FROM events e RIGHT JOIN orders o "
        "ON e.user_id = o.o_custkey"
    )
    assert not qc.last_decision.cached
    assert df.collect()[0]["n"] > 0
    # FULL OUTER caches as the r15 composite plan (left states +
    # matched set + anti side) — exactness pinned in test_full_outer.py;
    # here pin only that the decision is now a cached one
    got = qc.sql(
        "SELECT count(*) AS n FROM events e FULL OUTER JOIN orders o "
        "ON e.user_id = o.o_custkey"
    )
    assert qc.last_decision.cached, qc.last_decision.reason
    assert qc.last_decision.refresh_tier == "full_outer"
    plain = spark.sql(
        "SELECT count(*) AS n FROM events e FULL OUTER JOIN orders o "
        "ON e.user_id = o.o_custkey"
    )
    assert got.collect()[0]["n"] == plain.collect()[0]["n"]


def test_left_join_aggregate_cached(spark, qc, split):
    """fact LEFT JOIN dim: fact rows with no dim match survive with NULL
    dims — cacheable with the same incremental machinery."""
    run1, run2, cut_ns = split
    # a tiny dim that misses most buckets → NULL segment groups exist
    spark.range(3).select(
        F.col("id").alias("bucket_id"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("segment"),
    ).createOrReplaceTempView("user_seg_holes")
    sql = (
        "SELECT s.segment, count(*) AS n, round(sum(e.value), 2) AS sv "
        "FROM events_j e LEFT JOIN user_seg_holes s "
        "ON e.user_id % 100 = s.bucket_id GROUP BY 1 ORDER BY 1"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit
    expect = spark.sql(sql)
    assert rows_set(got) == rows_set(expect)
    # the NULL-segment group must be present (holes in the dim)
    assert any(r["segment"] is None for r in got.collect())
    spark.catalog.dropTempView("user_seg_holes")


def test_right_join_normalized_and_cached(spark, qc, split):
    """dim RIGHT JOIN fact ≡ fact LEFT JOIN dim (operand swap at parse
    time): cacheable, two-run exact, and served from the SAME entry as the
    LEFT spelling (identical fingerprint after normalization)."""
    run1, run2, cut_ns = split
    left_sql = (
        "SELECT s.segment, count(*) AS n, round(sum(e.value), 2) AS sv "
        "FROM events_j e LEFT JOIN user_seg s "
        "ON e.user_id % 100 = s.bucket_id GROUP BY 1 ORDER BY 1"
    )
    right_sql = (
        "SELECT s.segment, count(*) AS n, round(sum(e.value), 2) AS sv "
        "FROM user_seg s RIGHT JOIN events_j e "
        "ON e.user_id % 100 = s.bucket_id GROUP BY 1 ORDER BY 1"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(left_sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    assert not qc.last_decision.cache_hit
    fp_left = qc.last_decision.fingerprint

    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(right_sql)
    # the RIGHT spelling lands on the LEFT spelling's entry — a warm HIT
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert qc.last_decision.fingerprint == fp_left
    assert rows_set(got) == rows_set(spark.sql(right_sql))


def test_right_join_dim_preserved_passthrough(spark, qc, split):
    """fact RIGHT JOIN dim preserves the DIM side: its NULL-extended rows
    retract when a fresh fact row matches — not incrementally maintainable,
    so the swap-normalized form (dim first) must refuse and pass through."""
    run1, run2, cut_ns = split
    run2()
    qc.config.override_now_ns = cut_ns
    df = qc.sql(
        "SELECT count(*) AS n FROM events_j e RIGHT JOIN user_seg s "
        "ON e.user_id % 100 = s.bucket_id"
    )
    assert not qc.last_decision.cached
    assert df.collect()[0]["n"] > 0


@pytest.fixture()
def using_dim(spark):
    # USING requires the SAME column name on both sides: key the dim by
    # user_id directly (events.user_id % nothing — plain equality)
    spark.range(40).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("segment"),
    ).createOrReplaceTempView("user_seg_u")
    yield
    spark.catalog.dropTempView("user_seg_u")


def test_using_join_cached(spark, qc, split, using_dim):
    """JOIN ... USING (k): the key columns merge into ONE output column
    (Spark name-list join) — cacheable, two-run exact vs plain Spark."""
    run1, run2, cut_ns = split
    sql = (
        "SELECT segment, date_trunc('day', ts) AS d, count(*) AS n, "
        "round(sum(value), 2) AS sv "
        "FROM events_j JOIN user_seg_u USING (user_id) "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_left_using_join_cached_with_merged_key(spark, qc, split):
    """LEFT ... USING: unmatched fact rows keep the merged key from the
    fact side and NULL dims; the merged key is selectable unqualified."""
    run1, run2, cut_ns = split
    # a 2-row dim guarantees holes → NULL-segment groups must survive
    spark.range(2).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg"), F.col("id").cast("string")).alias("segment"),
    ).createOrReplaceTempView("user_seg_u")
    sql = (
        "SELECT user_id % 10 AS ub, segment, count(*) AS n "
        "FROM events_j LEFT JOIN user_seg_u USING (user_id) "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))
    # NULL-segment groups exist (the 2-row dim guarantees holes)
    assert any(r["segment"] is None for r in got.collect())
    spark.catalog.dropTempView("user_seg_u")


def test_right_using_join_cached(spark, qc, split, using_dim):
    """dim RIGHT JOIN fact USING (k): swap + USING compose."""
    run1, run2, cut_ns = split
    sql = (
        "SELECT segment, count(*) AS n "
        "FROM user_seg_u RIGHT JOIN events_j USING (user_id) "
        "GROUP BY 1 ORDER BY 1"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_natural_join_desugars_onto_using_path(spark, qc, split, using_dim):
    """NATURAL JOIN de-sugars to USING(common columns) at plan time (the
    session knows the registered-view schemas — r14 verdict item 1):
    two-run exact, and the spelling SHARES the explicit USING entry."""
    run1, run2, cut_ns = split
    nat = (
        "SELECT segment, count(*) AS n "
        "FROM events_j NATURAL JOIN user_seg_u GROUP BY 1 ORDER BY 1"
    )
    explicit = (
        "SELECT segment, count(*) AS n "
        "FROM events_j JOIN user_seg_u USING (user_id) "
        "GROUP BY 1 ORDER BY 1"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(explicit).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    fp = qc.last_decision.fingerprint
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(nat)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert qc.last_decision.fingerprint == fp  # entry sharing
    assert rows_set(got) == rows_set(spark.sql(nat))


def test_natural_left_join_cached_and_case_insensitive_using(
    spark, qc, split, using_dim
):
    """NATURAL LEFT rides the LEFT USING machinery (merged key, NULL
    dims); and USING-key spelling case neither refuses nor splits the
    entry (r15 advice: parser lowercases, session casefolds)."""
    run1, run2, cut_ns = split
    # a 2-row dim guarantees unmatched fact rows → NULL-segment groups
    spark.range(2).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg"), F.col("id").cast("string")).alias("segment"),
    ).createOrReplaceTempView("user_seg_u")
    nat = (
        "SELECT user_id % 10 AS ub, segment, count(*) AS n "
        "FROM events_j NATURAL LEFT JOIN user_seg_u "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )
    upper = (
        "SELECT user_id % 10 AS ub, segment, count(*) AS n "
        "FROM events_j LEFT JOIN user_seg_u USING (USER_ID) "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(upper).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    fp = qc.last_decision.fingerprint
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(nat)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert qc.last_decision.fingerprint == fp
    assert rows_set(got) == rows_set(spark.sql(nat))
    # the 40-row dim guarantees unmatched fact rows → NULL segments
    assert any(r["segment"] is None for r in got.collect())


def test_natural_side_qualified_key_passthrough(spark, qc, split, using_dim):
    """A NATURAL key is a USING key: side-qualified access to it (`u.k`)
    is NOT the merged column, so it must refuse → passthrough (the r14
    wrong-answer class, NATURAL edition)."""
    run1, run2, cut_ns = split
    run2()
    qc.config.override_now_ns = cut_ns
    sql = (
        "SELECT u.user_id, count(*) AS n "
        "FROM events_j e NATURAL LEFT JOIN user_seg_u u "
        "GROUP BY 1 ORDER BY 1"
    )
    got = qc.sql(sql)
    assert not qc.last_decision.cached, qc.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_natural_join_unknown_schema_stays_passthrough(spark, qc, split):
    """No common columns (or unknown operand schema) → the de-sugar
    declines and the NATURAL join stays an explicit passthrough."""
    run1, run2, cut_ns = split
    run2()
    spark.range(3).select(
        F.col("id").alias("zzz_key")
    ).createOrReplaceTempView("no_common_dim")
    try:
        qc.sql(
            "SELECT count(*) AS n FROM events_j NATURAL JOIN no_common_dim"
        )
        assert not qc.last_decision.cached
        assert "NATURAL" in (qc.last_decision.reason or "")
    finally:
        spark.catalog.dropTempView("no_common_dim")


def test_self_join_refusal_is_explicit_and_exact(spark, qc, split):
    """Self-joins stay passthrough BY DESIGN (r14 verdict item 4,
    considered): both operands advance with fresh data, so the delta
    Δ(A⋈A) = ΔA⋈A_old + A_old⋈ΔA + ΔA⋈ΔA needs fresh rows joined against
    the FULL history — the union-merge seam (state ∪ fresh partial) can't
    express the cross terms, alias scopes or not. The classic
    sessionless-pair shape must pass through with Spark-exact answers and
    the reason must name the cross-term contract, not mere ambiguity."""
    run1, run2, cut_ns = split
    run2()
    qc.config.override_now_ns = cut_ns
    sql = (
        "SELECT count(*) AS n FROM events_j e1 JOIN events_j e2 "
        "ON e1.user_id = e2.user_id AND e1.ts < e2.ts"
    )
    df = qc.sql(sql)
    assert not qc.last_decision.cached
    assert "self-join" in qc.last_decision.reason
    assert "cross terms" in qc.last_decision.reason
    assert df.collect()[0]["n"] == spark.sql(sql).collect()[0]["n"]


def test_side_qualified_using_key_passthrough(spark, qc):
    """`u.k` / `e.k` after a USING join is NOT the merged column — under
    LEFT USING the right side is NULL on unmatched rows. Qualified access
    must pass through so Spark's side-sensitive semantics stay exact
    (r14 probe find: qualifier-dropping silently served the merged value
    — count(u.user_id) returned the full row count instead of the
    matched count)."""
    spark.range(2).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("seg"),
    ).createOrReplaceTempView("dim_small")
    try:
        for sql in [
            "SELECT count(u.user_id) AS nu, count(*) AS n FROM events e "
            "LEFT JOIN dim_small u USING (user_id)",
            "SELECT u.user_id AS uu, count(*) AS n FROM events e "
            "LEFT JOIN dim_small u USING (user_id) GROUP BY 1 ORDER BY 1",
            # left-qualified equals the merged value under LEFT — but the
            # refusal is deliberately side-blind (conservative)
            "SELECT count(e.user_id) AS ne FROM events e "
            "LEFT JOIN dim_small u USING (user_id)",
        ]:
            got = qc.sql(sql)
            assert not qc.last_decision.cached, sql
            assert [tuple(r) for r in got.collect()] == [
                tuple(r) for r in spark.sql(sql).collect()
            ], sql
        # the MERGED (unqualified) column keeps caching
        sql = (
            "SELECT user_id % 2 AS b, count(*) AS n FROM events "
            "JOIN dim_small USING (user_id) GROUP BY 1 ORDER BY 1"
        )
        got = qc.sql(sql)
        assert qc.last_decision.cached, qc.last_decision.reason
        assert rows_set(got) == rows_set(spark.sql(sql))
    finally:
        spark.catalog.dropTempView("dim_small")


def test_star_leaf_join_desugar(spark, qc, split):
    """A STAR-projection leaf under a join spine de-sugars into the plain
    star-join path (r14): identical visible scope, and the pulled-up
    inner WHERE commutes with fact-preserved joins. Two-run exact; the
    spelling shares the unwrapped query's entry."""
    run1, run2, cut_ns = split
    wrapped = (
        "SELECT s.segment, count(*) AS n, round(sum(e.value), 2) AS sv "
        "FROM (SELECT * FROM events_j WHERE value > 0) e "
        "JOIN user_seg s ON e.user_id % 100 = s.bucket_id "
        "GROUP BY 1 ORDER BY 1"
    )
    direct = (
        "SELECT s.segment, count(*) AS n, round(sum(e.value), 2) AS sv "
        "FROM events_j e JOIN user_seg s ON e.user_id % 100 = s.bucket_id "
        "WHERE value > 0 GROUP BY 1 ORDER BY 1"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(direct).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    fp = qc.last_decision.fingerprint
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(wrapped)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert qc.last_decision.fingerprint == fp
    assert rows_set(got) == rows_set(spark.sql(wrapped))


def test_star_leaf_join_guards(spark, qc, split):
    """The de-sugaring must not resolve originally-invalid source-name
    qualifiers hidden by an anonymous wrapper (join-condition edition)."""
    run1, run2, cut_ns = split
    run2()
    qc.config.override_now_ns = cut_ns
    with pytest.raises(Exception, match="UNRESOLVED|cannot be resolved"):
        qc.sql(
            "SELECT s.segment, count(*) AS n FROM (SELECT * FROM events_j) "
            "JOIN user_seg s ON events_j.user_id % 100 = s.bucket_id "
            "GROUP BY 1"
        ).collect()
    assert not qc.last_decision.cached


def test_star_leaf_right_spine_where_not_hoisted(spark, qc, split):
    """r15 advice (high): a RIGHT spine makes the star wrapper the
    NON-preserved side, so pulling its inner WHERE above the (swapped)
    join would drop dim rows the original RIGHT join preserves with
    NULLs. The inlining must refuse; the query passes through and
    value-matches plain Spark — including the NULL-extended seg rows."""
    run1, run2, cut_ns = split
    run2()
    qc.config.override_now_ns = cut_ns
    sql = (
        "SELECT s.segment, count(e.user_id) AS n "
        "FROM (SELECT * FROM events_j WHERE value > 1e12) e "
        "RIGHT JOIN user_seg s ON e.user_id % 100 = s.bucket_id "
        "GROUP BY 1 ORDER BY 1"
    )
    got = qc.sql(sql)
    assert not qc.last_decision.cached, qc.last_decision.reason
    expect = spark.sql(sql)
    assert rows_set(got) == rows_set(expect)
    # the filter passes no events rows, so every segment survives with n=0
    assert {r["n"] for r in got.collect()} == {0}


def test_star_leaf_right_spine_pure_desugar_still_cached(spark, qc, split):
    """Without an inner WHERE there is nothing to hoist: the pure star
    de-sugar stays allowed and the downstream RIGHT→LEFT swap plans it
    on the cached path (fact-preserved after the swap)."""
    run1, run2, cut_ns = split
    sql = (
        "SELECT s.segment, count(*) AS n "
        "FROM (SELECT * FROM user_seg) s RIGHT JOIN events_j e "
        "ON e.user_id % 100 = s.bucket_id GROUP BY 1 ORDER BY 1"
    )
    run1()
    qc.config.override_now_ns = cut_ns
    qc.sql(sql).collect()
    assert qc.last_decision.cached, qc.last_decision.reason
    run2()
    qc.config.override_now_ns = cut_ns + 10**17
    got = qc.sql(sql)
    assert qc.last_decision.cache_hit, qc.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_natural_join_cte_shadow_stays_passthrough(spark, qc, split, using_dim):
    """A CTE can shadow a registered view's name with a DIFFERENT column
    set; the NATURAL de-sugar sees only the catalog, so any statement
    carrying a CTE map keeps its NATURAL joins un-desugared (wrong key
    set = wrong answers, not a refusal). Value-exact via passthrough."""
    run1, run2, cut_ns = split
    run2()
    qc.config.override_now_ns = cut_ns
    sql = (
        "WITH events_j AS (SELECT user_id, value FROM events_j "
        "WHERE value > 1) "
        "SELECT segment, count(*) AS n FROM events_j "
        "NATURAL JOIN user_seg_u GROUP BY 1 ORDER BY 1"
    )
    got = qc.sql(sql)
    assert not qc.last_decision.cached
    assert rows_set(got) == rows_set(spark.sql(sql))

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


# -- r10 aggregate additions ----------------------------------------------


def test_count_if_matches_plain(spark, qc_mem):
    """count_if(p) is rewritten to count(CASE WHEN p THEN 1 END) at parse
    and rides the mergeable count state."""
    sql = (
        "SELECT event_type, count_if(value > 50) AS hi, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_sum_distinct_matches_plain(spark, qc_mem):
    """sum(DISTINCT col) rides the capped distinct-set state; the finalize
    folds with the OUTPUT type's zero (integral promotes to long like
    Spark's own sum(DISTINCT); empty set stays NULL)."""
    sql = (
        "SELECT event_type, sum(DISTINCT user_id) AS sd, "
        "round(sum(DISTINCT value), 2) AS sv FROM events "
        "GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_sum_distinct_expression_stays_passthrough(spark, qc_mem):
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT event_type, sum(DISTINCT user_id % 10) AS sd FROM events "
        "GROUP BY 1 ORDER BY 1"
    )
    out = qc_mem.sql(sql)
    assert not qc_mem.last_decision.cached
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_skewness_kurtosis_match_plain(spark, qc_mem):
    """Third/fourth-moment family on raw power sums — same state style as
    the variance block; rounding absorbs the low-order-bit difference vs
    Spark's streaming central-moment update (verified to 4 decimals at
    sf0.1 too)."""
    sql = (
        "SELECT event_type, round(skewness(value) + 1e-9, 3) AS sk, "
        "round(kurtosis(value) + 1e-9, 3) AS ku, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_avg_distinct_matches_plain(spark, qc_mem):
    """avg(DISTINCT col) on the same set state — double fold / set size."""
    sql = (
        "SELECT event_type, round(avg(DISTINCT value) + 1e-9, 3) AS av, "
        "round(avg(DISTINCT user_id) + 1e-9, 3) AS au FROM events "
        "GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_avg_distinct_all_null_group_is_null(spark):
    """Empty distinct set (all-NULL group) must finalize to NULL — the
    unguarded division hit ANSI DIVIDE_BY_ZERO (found by the closing
    150-trial fuzz sweep, seed 101010)."""
    import datetime as dt

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        MemoryQueryCache,
        QueryCacheConfig,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [("a", 1.0, base), ("a", 2.0, base), ("b", None, base)]
    spark.createDataFrame(
        rows, "g string, v double, ts timestamp"
    ).createOrReplaceTempView("qc_avgd_null")
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=MemoryQueryCache(),
            default_temporal_column="ts",
            strict_errors=True,
        ),
    )
    sql = (
        "SELECT g, avg(DISTINCT v) AS a, sum(DISTINCT v) AS s "
        "FROM qc_avgd_null GROUP BY 1 ORDER BY 1"
    )
    got = [tuple(r) for r in qc.sql(sql).collect()]
    assert qc.last_decision.cached
    assert got == [tuple(r) for r in spark.sql(sql).collect()]
    assert got[1] == ("b", None, None)


def test_date_part_bad_arity_degrades_not_typeerror():
    """duckdb's list-of-parts form date_part(['year','month'], ts) and other
    arities must raise Unsupported (→ passthrough), never TypeError (which
    would take the unexpected-error path under strict_errors)."""
    import pytest
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark.functions.compile import _date_part
    from datafusion_query_cache_spark.plans.ir import Unsupported

    with pytest.raises(Unsupported):
        _date_part(F.lit("year"))  # one arg
    with pytest.raises(Unsupported):
        _date_part(F.col("parts"), F.col("ts"))  # non-literal field
    with pytest.raises(Unsupported):
        _date_part("year", F.col("ts"), F.col("extra"))  # three args
    with pytest.raises(Unsupported):
        _date_part("year", "ts_name")  # non-Column source


def test_is_true_false_predicates_value_correct(spark, qc_mem):
    """r11 find: duckdb serializes boolean CONSTANTS as 0/1 ints, so
    `(pred) IS NOT FALSE` compiled to `bool <=> 0` — AnalysisException
    under strict mode. The Lit now rebuilds the Python bool."""
    qc_mem.config.override_now_ns = None
    for sql in [
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE (value > 1) IS NOT FALSE GROUP BY 1 ORDER BY 1",
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE (value > 100) IS TRUE GROUP BY 1 ORDER BY 1",
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE (value > 100) IS FALSE GROUP BY 1 ORDER BY 1",
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE (value > 100) IS NOT TRUE GROUP BY 1 ORDER BY 1",
    ]:
        out = qc_mem.sql(sql)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert rows_set(out) == rows_set(spark.sql(sql)), sql


# -- FILTER (WHERE …) aggregates (r12) -------------------------------------


def _two_run_events(qc, spark, sql):
    import datetime as dt

    from pyspark.sql import functions as F

    ev = spark.table("events")
    mx = int(ev.agg(F.max("ts_ns")).collect()[0][0])
    cut_ns = (mx - 2 * 24 * 3600 * 10**9) // 1000 * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)
    ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("events")
    qc.config.override_now_ns = cut_ns
    try:
        qc.sql(sql).collect()
        assert qc.last_decision.cached, qc.last_decision.reason
        ev.createOrReplaceTempView("events")
        qc.config.override_now_ns = mx + 10**9
        out = qc.sql(sql)
        assert qc.last_decision.cache_hit
        return out
    finally:
        ev.createOrReplaceTempView("events")


def test_filter_clause_aggregates_cached(spark, qc_mem):
    """agg(x) FILTER (WHERE c) rewrites to agg(CASE WHEN c THEN x END) and
    rides the existing mergeable states — the conditional-aggregation
    dashboard (pt_conditional_agg's sugar form), incrementally exact."""
    sql = (
        "SELECT event_type, count(*) FILTER (WHERE value > 50) AS big, "
        "round(sum(value) FILTER (WHERE value > 50), 2) AS bs, "
        "round(avg(value) FILTER (WHERE value <= 50) + 1e-9, 2) AS sa, "
        "count(*) AS n FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run_events(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_filter_clause_pair_and_distinct_aggs(spark, qc_mem):
    """Pair aggregates wrap EVERY argument (an excluded row must not win
    the argmax with a NULL value); count(DISTINCT)/count_if compose."""
    sql = (
        "SELECT event_type, "
        "max_by(event_id, value) FILTER (WHERE value < 90) AS mb, "
        "count(DISTINCT user_id) FILTER (WHERE value > 20) AS du, "
        "count_if(value > 70) FILTER (WHERE user_id % 2 = 0) AS ci "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run_events(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_filter_clause_refusals(spark, qc_mem):
    """first/last refuse (the default temporal ordering key can't be
    nulled out); non-aggregate FILTER refuses (invalid in Spark too)."""
    qc_mem.config.override_now_ns = None
    qc_mem.sql(
        "SELECT first(value) FILTER (WHERE value > 50) AS f FROM events"
    ).collect()
    assert not qc_mem.last_decision.cached
    assert "FILTER on first" in qc_mem.last_decision.reason


# -- LIMIT ... OFFSET (r12 pagination) --------------------------------------


def test_offset_pagination_cached(spark, qc_mem):
    """LIMIT n OFFSET o on an aggregate: post-finalize like LIMIT, all
    pages share ONE state entry, each page exact vs plain Spark."""
    q = (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1 LIMIT 5 OFFSET 3"
    )
    out = _two_run_events(qc_mem, spark, q)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(q).collect()
    ]
    fp1 = qc_mem.last_decision.fingerprint
    q2 = q.replace("OFFSET 3", "OFFSET 8")
    got2 = qc_mem.sql(q2)
    assert qc_mem.last_decision.cache_hit
    assert qc_mem.last_decision.fingerprint == fp1  # pages share the entry
    assert [tuple(r) for r in got2.collect()] == [
        tuple(r) for r in spark.sql(q2).collect()
    ]


def test_offset_refusals(qc_mem):
    qc_mem.config.override_now_ns = None
    for sql, msg in [
        ("SELECT event_id FROM events ORDER BY 1 LIMIT 5 OFFSET 2",
         "OFFSET on a filter query"),
        ("SELECT DISTINCT event_type FROM events ORDER BY 1 LIMIT 3 OFFSET 1",
         "OFFSET on SELECT DISTINCT"),
    ]:
        qc_mem.sql(sql).collect()
        assert not qc_mem.last_decision.cached
        assert msg in qc_mem.last_decision.reason


def test_group_by_all_cached(spark, qc_mem):
    """GROUP BY ALL (duckdb FORCE_AGGREGATES marker; Spark 3.4+ accepts the
    syntax natively in passthrough): every non-aggregate select item is a
    group key — incrementally exact, temporal buckets included."""
    sql = (
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS n, round(sum(value), 2) AS s FROM events "
        "GROUP BY ALL ORDER BY 1, 2"
    )
    out = _two_run_events(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))
    # and it shares the entry with the explicit GROUP BY 1, 2 spelling
    fp = qc_mem.last_decision.fingerprint
    qc_mem.sql(sql.replace("GROUP BY ALL", "GROUP BY 1, 2")).collect()
    assert qc_mem.last_decision.cache_hit
    assert qc_mem.last_decision.fingerprint == fp


# -- PIVOT (r12) -------------------------------------------------------------


def test_pivot_cached_multi_agg(spark, qc_mem):
    """SELECT * FROM (...) PIVOT (...) rewritten to the grouped CASE
    aggregation: Spark-exact column naming ({value}_{alias} for multi-agg,
    value alias honored), incrementally exact."""
    sql = (
        "SELECT * FROM (SELECT event_type, CAST(date_trunc('day', ts) AS "
        "DATE) AS dd, value FROM events) "
        "PIVOT (count(*) AS n, round(sum(value), 2) AS s "
        "FOR event_type IN ('click', 'view' AS vw)) ORDER BY dd"
    )
    out = _two_run_events(qc_mem, spark, sql)
    pl = spark.sql(sql)
    assert out.columns == pl.columns == [
        "dd", "click_n", "click_s", "vw_n", "vw_s"
    ]
    assert rows_set(out) == rows_set(pl)


def test_pivot_missing_combo_is_null(spark, qc_mem):
    """Spark pivot yields NULL for a missing (group, value) combination —
    the count cells carry a presence guard (plain CASE would say 0).
    Synthetic view with a known-missing (b, 'y') combo."""
    import datetime as dt

    spark.createDataFrame(
        [
            ("a", "x", dt.datetime(2024, 1, 1)),
            ("a", "y", dt.datetime(2024, 1, 2)),
            ("b", "x", dt.datetime(2024, 1, 3)),
        ],
        "g string, p string, ts timestamp",
    ).createOrReplaceTempView("qc_pivot_null")
    sql = (
        "SELECT * FROM (SELECT g, p FROM qc_pivot_null) "
        "PIVOT (count(*) FOR p IN ('x', 'y')) ORDER BY g"
    )
    qc_mem.config.override_now_ns = None
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    got = [tuple(r) for r in out.collect()]
    exp = [tuple(r) for r in spark.sql(sql).collect()]
    assert got == exp
    assert got == [("a", 1, 1), ("b", 1, None)]  # the guard fires
    spark.catalog.dropTempView("qc_pivot_null")


def test_pivot_shares_source_predicate_and_refusals(spark, qc_mem):
    qc_mem.config.override_now_ns = None
    # multi-agg without aliases refuses (Spark generates opaque names)
    try:
        qc_mem.sql(
            "SELECT * FROM (SELECT event_type, value FROM events) "
            "PIVOT (count(*), sum(value) FOR event_type IN ('click'))"
        ).collect()
    except Exception:
        pass
    assert not qc_mem.last_decision.cached


# -- UNPIVOT (r12) -----------------------------------------------------------


def test_unpivot_cached_over_shared_inner(spark, qc_mem):
    """UNPIVOT over a derived aggregate: lowered to a UNION ALL of branches
    sharing ONE cached inner entry — NULL cells dropped (Spark default),
    entry aliases rename the key value, kept columns keep source order."""
    sql = (
        "SELECT * FROM (SELECT event_type, count(*) AS a, count(value) AS b "
        "FROM events GROUP BY 1) UNPIVOT (v FOR k IN (a, b AS bee)) "
        "ORDER BY event_type, k"
    )
    out = _two_run_events(qc_mem, spark, sql)
    assert "union of 2 cached branches" in qc_mem.last_decision.reason
    pl = spark.sql(sql)
    assert out.columns == pl.columns == ["event_type", "k", "v"]
    assert rows_set(out) == rows_set(pl)


def test_unpivot_order_validation_and_offset(spark, qc_mem):
    """UNPIVOT outer ORDER BY is restricted to output columns/positions
    (a dotted ref previously slipped through legacy qualifier-dropping);
    LIMIT … OFFSET paginates the unioned branches (r13)."""
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    import pytest

    with pytest.raises(Unsupported, match="output column"):
        parse_query(
            "SELECT * FROM (SELECT event_type, count(*) AS a, "
            "count(value) AS b FROM events GROUP BY 1) "
            "UNPIVOT (v FOR k IN (a, b)) ORDER BY x.k"
        )
    sql = (
        "SELECT * FROM (SELECT event_type, count(*) AS a, count(value) AS b "
        "FROM events GROUP BY 1) UNPIVOT (v FOR k IN (a, b)) "
        "ORDER BY 1, 2 LIMIT 4 OFFSET 3"
    )
    got = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]


def test_unpivot_null_semantics(spark, qc_mem):
    """Default drops NULL cells; INCLUDE NULLS keeps them — both exact."""
    qc_mem.config.override_now_ns = None
    base = (
        "SELECT * FROM (SELECT event_type, "
        "round(sum(value) FILTER (WHERE value > 1e9), 2) AS hi, "
        "round(sum(value), 2) AS all_v FROM events GROUP BY 1) "
        "UNPIVOT {inc}(amount FOR bucket IN (hi, all_v)) "
        "ORDER BY event_type, bucket"
    )
    for inc, n_exp in (("", 5), ("INCLUDE NULLS ", 10)):
        sql = base.format(inc=inc)
        out = qc_mem.sql(sql)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert rows_set(out) == rows_set(spark.sql(sql))
        assert out.count() == n_exp


def test_offset_refused_without_dataframe_offset(spark, qc_mem, monkeypatch):
    """pyspark<3.5 has no DataFrame.offset: LIMIT … OFFSET must refuse at
    parse time (→ passthrough, still correct) instead of raising
    AttributeError at finalize time."""
    import datafusion_query_cache_spark.plans.parser as parser_mod

    monkeypatch.setattr(parser_mod, "_df_offset_available", lambda: False)
    q = (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1 LIMIT 5 OFFSET 3"
    )
    out = qc_mem.sql(q)
    assert not qc_mem.last_decision.cached
    assert "pyspark>=3.5" in qc_mem.last_decision.reason
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(q).collect()
    ]


def test_pivot_multi_column_cached(spark, qc_mem):
    """r13: k-column PIVOT — FOR (a, b) IN (('x', 1) [AS n], …) rides the
    same grouped-CASE rewrite; unaliased cells take Spark's exact
    '{v1, v2}' naming, count cells keep the presence guard."""
    q = (
        "SELECT * FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS d, "
        "event_type, user_id % 2 AS par, value FROM events) "
        "PIVOT (round(sum(value),2) FOR (event_type, par) IN "
        "(('click', 0), ('view', 1) AS v1, ('error', 0) AS e0)) ORDER BY d"
    )
    out = _two_run_events(qc_mem, spark, q)
    assert out.columns == spark.sql(q).columns == ["d", "{click, 0}", "v1", "e0"]
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(q).collect()
    ]


def test_pivot_multi_column_multi_agg(spark, qc_mem):
    q = (
        "SELECT * FROM (SELECT event_type, user_id % 2 AS par, value "
        "FROM events) "
        "PIVOT (round(sum(value),2) AS s, count(value) AS c "
        "FOR (event_type, par) IN (('click', 0), ('view', 1) AS v1))"
    )
    out = qc_mem.sql(q)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert out.columns == spark.sql(q).columns
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, spark.sql(q).collect())
    )


# -- struct-field references (r13) -------------------------------------------


def test_struct_field_group_by_cached(spark, qc_mem):
    """meta.t group keys: a multi-part ref whose root is NOT a visible
    relation is a struct FIELD PATH (kept dotted), not a table qualifier.
    Before r13 the qualifier was dropped blindly, building a plan over a
    nonexistent bare column (loud failure under strict_errors,
    passthrough otherwise)."""
    from pyspark.sql import functions as F

    ev = spark.table("events")
    ev.withColumn(
        "meta",
        F.struct(
            F.col("event_type").alias("t"), (F.col("user_id") % 3).alias("b")
        ),
    ).createOrReplaceTempView("ev_struct")
    for q in [
        "SELECT meta.t AS t, count(*) AS n FROM ev_struct GROUP BY 1 ORDER BY 1",
        # unaliased: output named by the LAST path segment, Spark behavior
        "SELECT meta.t, meta.b, round(sum(value),2) AS s FROM ev_struct "
        "GROUP BY 1, 2 ORDER BY 1, 2",
        # 3-part: table alias stripped, field path kept
        "SELECT e.meta.t AS t, count(*) AS n FROM ev_struct e "
        "WHERE e.meta.b = 1 GROUP BY 1 ORDER BY 1",
    ]:
        got = qc_mem.sql(q)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        plain = spark.sql(q)
        assert got.columns == plain.columns
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in plain.collect()
        ]


def test_struct_field_correlated_key_cached(spark, qc_mem):
    """A correlated equality whose inner side is a struct FIELD PATH
    (``i.meta.t = o.meta.t``): the rollup's unaliased output is named by
    the LAST segment (Spark naming), so the dotted path cannot serve as
    the join-key name — it must take a generated ``qc_k`` alias like an
    expression key (r13 cross-feature probe find: the assembly selected
    ``F.col('meta.t')`` off a frame whose column was ``t``)."""
    from pyspark.sql import functions as F

    ev = spark.table("events")
    ev.withColumn(
        "meta",
        F.struct(
            F.col("event_type").alias("t"), (F.col("user_id") % 3).alias("b")
        ),
    ).createOrReplaceTempView("ev_struct_ck")
    q = (
        "SELECT event_type, count(*) AS n FROM ev_struct_ck o WHERE value > "
        "(SELECT avg(value) FROM ev_struct_ck i WHERE i.meta.t = o.meta.t "
        "AND i.user_id % 3 = o.user_id % 3) GROUP BY event_type ORDER BY 1"
    )
    got = qc_mem.sql(q)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    plain = spark.sql(q)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_struct_path_above_derived_table_refuses(spark, qc_mem):
    """`meta.t` ABOVE a derived table is invalid SQL (the derived output
    is named `t`): the outer items must lower under the OUTER scope so
    the ref stays a struct path and the inner-output check refuses it —
    with the caller's empty scope it fell to legacy qualifier-dropping,
    resolved to `t`, and ANSWERED a query plain Spark rejects (r13
    sf0.01 sweep find)."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    ev = spark.table("events")
    ev.withColumn(
        "meta", F.struct(F.col("event_type").alias("t"))
    ).createOrReplaceTempView("ev_struct_ot")
    bad = (
        "SELECT h, meta.t, nv FROM (SELECT date_trunc('hour', ts) AS h, "
        "meta.t, count(value) AS nv FROM ev_struct_ot GROUP BY 1, 2) __f "
        "WHERE nv >= 0"
    )
    with pytest.raises(AnalysisException):
        qc_mem.sql(bad).collect()
    assert not qc_mem.last_decision.cached
    assert "not produced by the derived table" in qc_mem.last_decision.reason
    # the valid spellings (alias-qualified / bare) still cache and match
    for q in [
        "SELECT x.h, x.t, x.nv FROM (SELECT date_trunc('hour', ts) AS h, "
        "meta.t, count(value) AS nv FROM ev_struct_ot GROUP BY 1, 2) x "
        "ORDER BY 1, 2",
        "SELECT h, t, nv FROM (SELECT date_trunc('hour', ts) AS h, meta.t, "
        "count(value) AS nv FROM ev_struct_ot GROUP BY 1, 2) x ORDER BY 1, 2",
    ]:
        got = qc_mem.sql(q)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in spark.sql(q).collect()
        ]


def test_pivot_source_struct_field_cached(spark, qc_mem):
    """PIVOT whose derived-projection items include a struct field path:
    the source items must lower under the SOURCE's scope — without the
    push ``meta.t AS t`` fell to the legacy qualifier-dropping branch
    and the cell predicates referenced a nonexistent bare column (r13
    cross-feature probe find)."""
    from pyspark.sql import functions as F

    ev = spark.table("events")
    ev.withColumn(
        "meta", F.struct(F.col("event_type").alias("t"))
    ).createOrReplaceTempView("ev_struct_pv")
    q = (
        "SELECT * FROM (SELECT meta.t AS t, user_id % 2 AS par, value "
        "FROM ev_struct_pv) PIVOT (count(*) AS c, round(sum(value), 3) AS s "
        "FOR (t, par) IN (('view', 0) AS v0, ('click', 1) AS c1))"
    )
    got = qc_mem.sql(q)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    plain = spark.sql(q)
    assert got.columns == plain.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )


# -- nested set operations (r13) ----------------------------------------------


def test_setop_limit_offset_cached(spark, qc_mem):
    """LIMIT … OFFSET pagination over a set operation replays
    post-finalize on O(state) rows (r13; previously Unsupported)."""
    q = (
        "SELECT event_type AS k, count(*) AS n FROM events WHERE value > 0 "
        "GROUP BY 1 UNION ALL "
        "SELECT event_type AS k, count(*) AS n FROM events WHERE value <= 0 "
        "GROUP BY 1 ORDER BY k, n LIMIT 3 OFFSET 2"
    )
    got = qc_mem.sql(q)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in spark.sql(q).collect()
    ]


def test_cte_over_set_operation_cached(spark, qc_mem):
    """WITH over a UNION/EXCEPT: the CTE inlines into every branch as a
    derived table (r13; previously Unsupported)."""
    for q in [
        # both branches read the CTE
        "WITH base AS (SELECT event_type AS k, count(*) AS n FROM events "
        "GROUP BY 1) SELECT k, n FROM base WHERE n > 1 UNION ALL "
        "SELECT k, n FROM base WHERE n <= 1 ORDER BY k, n",
        # mixed: one branch reads the CTE, one aggregates directly
        "WITH hi AS (SELECT event_type AS k, count(*) AS n FROM events "
        "WHERE value > 50 GROUP BY 1) SELECT k, n FROM hi EXCEPT "
        "SELECT event_type AS k, count(*) AS n FROM events GROUP BY 1",
    ]:
        got = qc_mem.sql(q)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, spark.sql(q).collect())
        )


def test_nested_set_operations_cached(spark, qc_mem):
    """Chained / mixed set-operation trees: every LEAF owns its cache
    entry; the tree replays over finalized results (left-associative,
    INTERSECT binding tighter — both parsers agree)."""
    B = (
        "SELECT event_type AS k, count(*) AS n FROM events "
        "WHERE value > {v} GROUP BY 1"
    )
    for sql in [
        f"{B.format(v=0)} EXCEPT {B.format(v=100)} EXCEPT {B.format(v=200)}",
        f"{B.format(v=0)} INTERSECT {B.format(v=1)} UNION {B.format(v=400)} "
        "ORDER BY 1, 2",
        f"({B.format(v=0)} UNION ALL {B.format(v=1)}) EXCEPT ALL "
        f"{B.format(v=2)}",
    ]:
        got = qc_mem.sql(sql)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, spark.sql(sql).collect())
        )


def test_nested_set_operation_two_run(spark, qc_mem):
    B = (
        "SELECT event_type AS k, count(*) AS n FROM events "
        "WHERE value > {v} GROUP BY 1"
    )
    sql = (
        f"{B.format(v=0)} EXCEPT {B.format(v=150)} EXCEPT {B.format(v=300)} "
        "ORDER BY 1"
    )
    out = _two_run_events(qc_mem, spark, sql)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]


# -- linear-regression aggregates (r13) ---------------------------------------


def test_regr_family_matches_plain(spark, qc_mem):
    """regr_* on the central co-moment state (same as corr/covar):
    incremental two-run ≡ plain Spark, rounding absorbing the low-order
    re-association bit."""
    sql = (
        "SELECT event_type, regr_count(value, user_id) AS rc, "
        "round(regr_avgx(value, user_id) + 1e-9, 4) AS ax, "
        "round(regr_avgy(value, user_id) + 1e-9, 4) AS ay, "
        "round(regr_slope(value, user_id) + 1e-9, 6) AS sl, "
        "round(regr_intercept(value, user_id) + 1e-9, 4) AS ic, "
        "round(regr_r2(value, user_id) + 1e-9, 6) AS r2, "
        "round(regr_sxy(value, user_id) + 1e-9, 2) AS sxy "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run_events(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_regr_edge_groups_match_plain(spark):
    """Constant-x (undefined slope → NULL), single pair, and no-valid-pair
    groups must reproduce Spark exactly, incrementally."""
    import datetime as dt

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        MemoryQueryCache,
        QueryCacheConfig,
    )

    base, later = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    h1 = [
        ("c", 1.0, 2.0, base), ("c", 1.0, 5.0, base), ("s", 3.0, 4.0, base),
        ("n", None, 9.0, base), ("n", 4.0, None, base), ("g", 1.0, 2.0, base),
    ]
    h2 = [("g", 2.0, 4.1, later), ("g", 3.0, 5.9, later), ("c", 1.0, 7.0, later)]
    sch = "g string, x double, y double, ts timestamp"
    sql = (
        "SELECT g, regr_count(y, x) AS rc, regr_avgx(y, x) AS ax, "
        "regr_avgy(y, x) AS ay, regr_sxx(y, x) AS sxx, regr_syy(y, x) AS syy, "
        "regr_sxy(y, x) AS sxy, regr_slope(y, x) AS sl, "
        "regr_intercept(y, x) AS ic, regr_r2(y, x) AS r2 "
        "FROM rg GROUP BY 1 ORDER BY 1"
    )
    spark.createDataFrame(h1, sch).createOrReplaceTempView("rg")
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=MemoryQueryCache(),
            default_temporal_column="ts",
            strict_errors=True,
            override_now_ns=int(
                base.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9
            )
            + 1,
        ),
    )
    qc.sql(sql).collect()
    assert qc.last_decision.cached
    spark.createDataFrame(h1 + h2, sch).createOrReplaceTempView("rg")
    qc.config.override_now_ns = (
        int(later.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9) + 10**9
    )
    got = [tuple(r) for r in qc.sql(sql).collect()]
    assert qc.last_decision.cache_hit
    import math

    exp = [tuple(r) for r in spark.sql(sql).collect()]

    def close(a, b):
        if a is None or b is None:
            return a is b
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return abs(a - b) <= 1e-9 * (1 + abs(b))
        return a == b

    assert len(got) == len(exp)
    assert all(all(close(x, y) for x, y in zip(g, e)) for g, e in zip(got, exp))


def test_count_distinct_tuples_cached(spark, qc_mem):
    """count(DISTINCT a, b) — distinct TUPLES on a struct set state; rows
    with ANY NULL component excluded (SQL semantics)."""
    sql = (
        "SELECT event_type, count(DISTINCT user_id, value > 100) AS d2, "
        "count(DISTINCT user_id % 7, user_id % 3) AS d3, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    out = _two_run_events(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_count_distinct_tuples_null_component(spark):
    import datetime as dt

    from datafusion_query_cache_spark import (
        CachedSparkSession,
        MemoryQueryCache,
        QueryCacheConfig,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", 1, "x", base), ("a", 1, "x", base), ("a", 1, None, base),
        ("a", None, "x", base), ("b", 2, "y", base),
    ]
    spark.createDataFrame(
        rows, "g string, u int, v string, ts timestamp"
    ).createOrReplaceTempView("cd2")
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=MemoryQueryCache(),
            default_temporal_column="ts",
            strict_errors=True,
        ),
    )
    sql = "SELECT g, count(DISTINCT u, v) AS d FROM cd2 GROUP BY 1 ORDER BY 1"
    got = [tuple(r) for r in qc.sql(sql).collect()]
    assert qc.last_decision.cached
    assert got == [tuple(r) for r in spark.sql(sql).collect()] == [
        ("a", 1), ("b", 1)
    ]


def test_setop_branch_nested_with_sees_outer_ctes(spark, qc_mem):
    """A set-operation branch carrying its OWN nested WITH must still see
    the outer CTE defs (r14 advice): an outer-CTE reference inside that
    branch previously resolved against the catalog — a silent wrong
    answer when a REAL table shares the CTE name. The decoy view here
    must be shadowed by the CTE, exactly like plain Spark scopes it."""
    spark.sql(
        "SELECT event_id, 'WRONG' AS event_type, value, ts "
        "FROM events LIMIT 10"
    ).createOrReplaceTempView("base_c")
    try:
        sql = (
            "WITH base_c AS (SELECT event_type, value, ts FROM events "
            "WHERE value > 1) "
            "SELECT event_type, count(*) AS n FROM base_c GROUP BY 1 "
            "UNION ALL "
            "(WITH own AS (SELECT event_type, value FROM base_c "
            "WHERE value > 50) "
            "SELECT event_type, count(*) AS n FROM own GROUP BY 1)"
        )
        qc_mem.config.override_now_ns = None
        out = qc_mem.sql(sql)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert rows_set(out) == rows_set(spark.sql(sql))
        assert not any(r["event_type"] == "WRONG" for r in out.collect())
    finally:
        spark.catalog.dropTempView("base_c")


def test_cte_reference_with_branch_alias_caches(spark, qc_mem):
    """``FROM r b`` with ``b.k`` refs: the inlined derived table keeps the
    branch-side alias so alias-qualified references still cache (r14
    advice — previously a correct-but-uncached refusal)."""
    sql = (
        "WITH r AS (SELECT event_type, value, ts FROM events "
        "WHERE value > 1) "
        "SELECT b.event_type, count(*) AS n FROM r b GROUP BY 1 ORDER BY 1"
    )
    qc_mem.config.override_now_ns = None
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_pivot_order_by_validated_at_parse_time(spark, qc_mem):
    """PIVOT outer ORDER BY rides the same parse-time validation as
    UNPIVOT (r14 advice): positional refs resolve against the output
    list; non-output refs refuse early → passthrough → Spark's loud
    error."""
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT * FROM (SELECT event_type, user_id % 3 AS ub, value "
        "FROM events) PIVOT (round(sum(value), 2) FOR ub IN (0, 1, 2)) "
        "ORDER BY 1"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))
    import pytest as _pytest

    with _pytest.raises(Exception, match="UNRESOLVED|cannot be resolved"):
        qc_mem.sql(sql.replace("ORDER BY 1", "ORDER BY x.bogus")).collect()
    assert not qc_mem.last_decision.cached

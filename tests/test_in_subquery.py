"""IN-subquery aggregates: ``WHERE k IN (SELECT k FROM t GROUP BY k …)``.

Same design as scalar subqueries (``test_scalar_subquery.py``): the
reference's bottom-up rule caches the inner Aggregate wherever it sits
(``src/aggregate.rs:74-76``); the inner runs through the cached pipeline at
plan time, its single output column folds into the outer predicate as an
IN-list of literals with exact SQL NULL semantics, and the outer executes
as plain Spark ops. The fold cap (``config.in_subquery_max_values``)
degrades high-cardinality inners to passthrough.
"""

from __future__ import annotations

import pytest

from tests.conftest import rows_set
from tests.test_scalar_subquery import _two_run


# -- parsing ------------------------------------------------------------


def test_parse_in_subquery():
    from datafusion_query_cache_spark.plans.ir import FilterSpec, InSubquery
    from datafusion_query_cache_spark.plans.parser import (
        parse_query,
        scalar_subqueries,
    )

    s = parse_query(
        "SELECT event_id FROM events WHERE event_type IN "
        "(SELECT event_type FROM events GROUP BY 1 HAVING count(*) > 3)"
    )
    assert isinstance(s, FilterSpec)
    subqs = scalar_subqueries(s)
    assert len(subqs) == 1 and isinstance(subqs[0], InSubquery)
    inner = subqs[0].spec
    assert inner.table == "events" and len(inner.group_by) == 1
    # the HAVING aggregate rides as the hidden state-bearing item
    assert inner.having is not None


@pytest.mark.parametrize(
    "sql,msg",
    [
        # qualified OUTER reference inside the body: correlated — lowering
        # standalone would silently re-bind it to the inner table
        (
            "SELECT event_id FROM events e WHERE e.event_type IN "
            "(SELECT x.event_type FROM events x "
            "WHERE e.value > 1 GROUP BY 1 HAVING count(*) > 3)",
            "correlated/qualified",
        ),
        # multi-column inner
        (
            "SELECT event_id FROM events WHERE event_type IN "
            "(SELECT event_type, count(*) FROM events GROUP BY 1)",
            "one-column aggregate",
        ),
        # group-by with no aggregate anywhere: no partial state to cache
        (
            "SELECT event_id FROM events WHERE event_type IN "
            "(SELECT event_type FROM events GROUP BY 1)",
            "without aggregates",
        ),
        # LIMIT inside the body: nondeterministic value set
        (
            "SELECT event_id FROM events WHERE event_type IN "
            "(SELECT event_type FROM events GROUP BY 1 "
            "HAVING count(*) > 3 LIMIT 2)",
            "one-column aggregate",
        ),
    ],
)
def test_parse_in_subquery_unsupported(sql, msg):
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match=msg):
        parse_query(sql)


def test_parse_group_by_having_only_aggregate():
    """``SELECT k FROM t GROUP BY k HAVING agg(…)`` is the aggregate
    shape even though no select item aggregates — the HAVING aggregate is
    the (hidden) state-bearing item."""
    from datafusion_query_cache_spark.plans.ir import AggSpec
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        "SELECT event_type FROM events GROUP BY 1 HAVING count(*) > 3"
    )
    assert isinstance(s, AggSpec)
    assert not s.aggregates and s.having is not None


# -- behavior -----------------------------------------------------------


def test_in_subquery_filter_matches_plain(spark, qc_mem):
    sql = (
        "SELECT event_id, event_type, value FROM events "
        "WHERE event_type IN (SELECT event_type FROM events "
        "GROUP BY 1 HAVING count(*) > 50) ORDER BY event_id"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_not_in_subquery_matches_plain(spark, qc_mem):
    sql = (
        "SELECT event_id, event_type FROM events "
        "WHERE event_type NOT IN (SELECT event_type FROM events "
        "GROUP BY 1 HAVING count(*) > 200) ORDER BY event_id"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_in_subquery_agg_outer_matches_plain(spark, qc_mem):
    sql = (
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE user_id IN (SELECT max(user_id) FROM events "
        "GROUP BY event_type) GROUP BY 1 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_in_subquery_bare_group_having_cached(spark, qc_mem):
    sql = (
        "SELECT event_type FROM events GROUP BY 1 "
        "HAVING count(*) > 50 ORDER BY 1"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_in_subquery_shares_standalone_entry(spark, qc_mem):
    """The IN body and the standalone spelling hit ONE cache entry."""
    qc_mem.config.override_now_ns = None
    inner = (
        "SELECT event_type FROM events GROUP BY 1 HAVING count(*) > 50"
    )
    qc_mem.sql(inner).collect()
    assert qc_mem.last_decision.cached
    fp = qc_mem.last_decision.fingerprint
    qc_mem.sql(
        "SELECT event_id FROM events WHERE event_type IN "
        f"({inner})"
    ).collect()
    d = qc_mem.last_decision
    assert d.cached and d.cache_hit and d.fingerprint == fp


def test_in_subquery_cap_degrades_to_passthrough(spark, qc_mem):
    qc_mem.config.in_subquery_max_values = 2
    sql = (
        "SELECT count(*) AS n FROM events "
        "WHERE user_id IN (SELECT min(user_id) FROM events "
        "GROUP BY user_id)"
    )
    out = qc_mem.sql(sql)
    assert not qc_mem.last_decision.cached
    assert "more than 2 distinct values" in qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_in_subquery_cap_counts_distinct_not_rows(spark, qc_mem):
    """>cap result ROWS but ≤cap distinct values must still fold: the cap
    measures the folded set size (max per high-cardinality group collapses
    to few distinct maxima)."""
    n_types = spark.sql(
        "SELECT count(DISTINCT event_type) AS n FROM events"
    ).collect()[0][0]
    n_groups = spark.sql(
        "SELECT count(DISTINCT user_id) AS n FROM events"
    ).collect()[0][0]
    assert n_groups > n_types  # the premise: many groups, few values
    qc_mem.config.in_subquery_max_values = n_types
    sql = (
        "SELECT count(*) AS n FROM events "
        "WHERE event_type IN (SELECT max(event_type) FROM events "
        "GROUP BY user_id)"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached
    assert rows_set(out) == rows_set(spark.sql(sql))


# -- NULL semantics ------------------------------------------------------


@pytest.fixture()
def null_tables(spark):
    """probe(x) vs vals(v,ts): vals' max-per-group includes a NULL."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "x int"
    ).createOrReplaceTempView("qc_in_probe")
    rows = [
        ("a", 1, base),
        ("a", 1, base),
        ("b", None, base),
        ("b", None, base),
        ("c", 9, base),  # below the HAVING threshold
    ]
    spark.createDataFrame(
        rows, "g string, v int, ts timestamp"
    ).createOrReplaceTempView("qc_in_vals")
    return None


def _null_qc(spark, tmp_path_factory=None):
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        MemoryQueryCache,
        QueryCacheConfig,
    )

    return CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=MemoryQueryCache(),
            default_temporal_column="ts",
            strict_errors=True,
        ),
    )


def test_in_set_containing_null(spark, null_tables):
    """x IN (1, NULL): TRUE on match, NULL (filtered) otherwise — folding
    must not simply drop the NULL when the node sits under NOT."""
    qc = _null_qc(spark)
    sql = (
        "SELECT x FROM qc_in_probe WHERE x IN "
        "(SELECT max(v) FROM qc_in_vals GROUP BY g HAVING count(*) > 1)"
    )
    out = qc.sql(sql)
    assert qc.last_decision.cached, qc.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))
    assert [tuple(r) for r in out.collect()] == [(1,)]


def test_not_in_set_containing_null_is_empty(spark, null_tables):
    """x NOT IN (1, NULL) is never TRUE (NULL comparison) — the folded
    predicate must eliminate every row, exactly like plain SQL."""
    qc = _null_qc(spark)
    sql = (
        "SELECT x FROM qc_in_probe WHERE x NOT IN "
        "(SELECT max(v) FROM qc_in_vals GROUP BY g HAVING count(*) > 1)"
    )
    out = qc.sql(sql)
    assert qc.last_decision.cached, qc.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))
    assert out.count() == 0


def test_in_empty_set(spark, null_tables):
    """x IN (empty) is FALSE for every x; NOT IN (empty) is TRUE for every
    row (including x NULL? no — NULL stays NULL under NOT(FALSE)=TRUE…
    plain Spark is the oracle either way)."""
    qc = _null_qc(spark)
    for sql in (
        "SELECT x FROM qc_in_probe WHERE x IN "
        "(SELECT max(v) FROM qc_in_vals GROUP BY g HAVING count(*) > 9)",
        "SELECT x FROM qc_in_probe WHERE x NOT IN "
        "(SELECT max(v) FROM qc_in_vals GROUP BY g HAVING count(*) > 9)",
    ):
        out = qc.sql(sql)
        assert qc.last_decision.cached, qc.last_decision.reason
        assert rows_set(out) == rows_set(spark.sql(sql))


def test_having_mixes_group_key_and_in_subquery(spark, qc_mem):
    """HAVING may reference the group KEY alongside the folded IN — the
    hidden __qc_having item carries both (grouping columns are legal
    inside Spark aggregate expression lists)."""
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
        "HAVING event_type IN (SELECT event_type FROM events GROUP BY 1 "
        "HAVING count(*) > 50) ORDER BY 1"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_having_mixes_group_key_and_scalar(spark, qc_mem):
    qc_mem.config.override_now_ns = None
    sql = (
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
        "HAVING count(*) > (SELECT count(*) FROM events) / 10 "
        "AND event_type != 'error' ORDER BY 1"
    )
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


# -- quantified comparisons (r11): x <op> ANY / ALL ----------------------


def test_parse_quantified_any():
    from datafusion_query_cache_spark.plans.ir import FilterSpec, InSubquery, Not
    from datafusion_query_cache_spark.plans.parser import (
        parse_query,
        scalar_subqueries,
    )

    s = parse_query(
        "SELECT event_id FROM events WHERE user_id > ANY "
        "(SELECT min(user_id) FROM events GROUP BY event_type)"
    )
    assert isinstance(s, FilterSpec)
    (sq,) = scalar_subqueries(s)
    assert isinstance(sq, InSubquery) and sq.op == ">"
    # ALL arrives as NOT(negated-op ANY) — duckdb canonicalization
    s2 = parse_query(
        "SELECT event_id FROM events WHERE user_id > ALL "
        "(SELECT max(user_id) FROM events GROUP BY event_type)"
    )
    (sq2,) = scalar_subqueries(s2)
    assert sq2.op == "<="
    assert any(isinstance(n, Not) for n in s2.predicate.walk())


def _duck_rows(spark, sql, views):
    """DuckDB oracle over the CURRENT content of the named Spark views —
    Spark itself cannot parse `<op> ANY/ALL (subquery)` (this surface is
    capability BEYOND passthrough), so the expected values come from
    DuckDB, the engine whose quantifier semantics the fold reproduces."""
    import duckdb

    con = duckdb.connect()
    for v in views:
        con.register(v, spark.table(v).toPandas())
    import math

    out = []
    for r in con.execute(sql).fetchall():
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def test_quantified_any_all_match_duckdb(spark, qc_mem):
    qc_mem.config.override_now_ns = None
    for sql in [
        "SELECT count(*) AS n FROM events WHERE user_id > ANY "
        "(SELECT min(user_id) + 5 FROM events GROUP BY event_type)",
        "SELECT count(*) AS n FROM events WHERE user_id >= ALL "
        "(SELECT min(user_id) FROM events GROUP BY event_type)",
        "SELECT count(*) AS n FROM events WHERE event_type <> ALL "
        "(SELECT event_type FROM events GROUP BY 1 HAVING count(*) > 1000000)",
        "SELECT count(*) AS n FROM events WHERE user_id < ANY "
        "(SELECT max(user_id) FROM events GROUP BY event_type)",
    ]:
        out = qc_mem.sql(sql)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert rows_set(out) == _duck_rows(spark, sql, ["events"]), sql


def test_quantified_two_run_incremental(spark, qc_mem):
    sql = (
        "SELECT count(*) AS n FROM events WHERE user_id > ANY "
        "(SELECT min(user_id) + 5 FROM events GROUP BY event_type)"
    )
    out = _two_run(qc_mem, spark, sql)
    assert qc_mem.last_decision.cached
    assert rows_set(out) == _duck_rows(spark, sql, ["events"])


def test_quantified_null_semantics(spark, qc_mem):
    """NULLs in the probe and the set: the OR/NOT fold must reproduce
    SQL's three-valued quantifier logic exactly (DuckDB oracle)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, 5, base), (2, None, base), (3, 100, base)],
        "id int, x int, ts timestamp",
    ).createOrReplaceTempView("qprobe")
    spark.createDataFrame(
        [(1, 10, base), (2, None, base)], "g int, v int, ts timestamp"
    ).createOrReplaceTempView("qvals")
    qc_mem.config.override_now_ns = None
    for sql in [
        # x > ANY {10, NULL}: 100→TRUE, 5→NULL(not FALSE), NULL→NULL
        "SELECT id FROM qprobe WHERE x > ANY (SELECT max(v) FROM qvals "
        "GROUP BY g) ORDER BY id",
        # x > ALL {10, NULL} = NOT(x <= ANY): 100→NOT NULL→NULL, drops all
        "SELECT id FROM qprobe WHERE x > ALL (SELECT max(v) FROM qvals "
        "GROUP BY g) ORDER BY id",
    ]:
        out = qc_mem.sql(sql)
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        assert rows_set(out) == _duck_rows(spark, sql, ["qprobe", "qvals"]), sql

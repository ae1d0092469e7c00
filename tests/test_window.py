"""Window functions over a cached derived-table aggregate.

The reference's bottom-up rule rewrites the Aggregate wherever it sits, so
``Window(Aggregate(...))`` plans get a cached aggregate underneath for free
(``src/aggregate.rs:74-76``). Here the same shape is the outer select of a
derived table: the window evaluates post-finalize over O(state) rows, the
cached state and fingerprint are those of the inner aggregate alone.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


def _two_run(qc, spark, sql):
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
        assert qc.last_decision.cached and qc.last_decision.cache_hit
        return out
    finally:
        ev.createOrReplaceTempView("events")


DAILY = (
    "SELECT CAST(date_trunc('day', ts) AS DATE) AS dd, count(*) AS n "
    "FROM events GROUP BY 1"
)
TYPE_DAILY = (
    "SELECT event_type AS et, CAST(date_trunc('day', ts) AS DATE) AS dd, "
    "count(*) AS n FROM events GROUP BY 1, 2"
)


# -- parsing ------------------------------------------------------------


def test_parse_window_shape():
    from datafusion_query_cache_spark.plans.ir import SubquerySpec, WindowExpr
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        f"SELECT dd, n, rank() OVER (ORDER BY n DESC, dd) AS r FROM ({DAILY}) t"
    )
    assert isinstance(s, SubquerySpec)
    w = s.items[2].expr
    assert isinstance(w, WindowExpr) and w.fn == "rank"
    assert len(w.order_by) == 2 and w.order_by[0].desc
    # fingerprint = inner aggregate alone, shared with the bare rollup
    assert s.inner.canon() == parse_query(DAILY).canon()


@pytest.mark.parametrize(
    "sql,msg",
    [
        # windows over a plain filter query: row-set tiers don't replay them
        (
            "SELECT event_id, rank() OVER (ORDER BY value) AS r FROM events",
            "window function over a filter query",
        ),
        # windows directly in an aggregate query's select list
        (
            "SELECT event_type, count(*) AS n, "
            "rank() OVER (ORDER BY event_type) AS r FROM events GROUP BY 1",
            "not in GROUP BY",
        ),
        # GROUPS frame → passthrough (DuckDB's parser itself rejects it;
        # Spark has no GROUPS mode either)
        (
            f"SELECT dd, sum(n) OVER (ORDER BY n GROUPS BETWEEN 2 PRECEDING "
            f"AND CURRENT ROW) AS s FROM ({DAILY}) t",
            "GROUPS mode",
        ),
        # fractional RANGE offset → passthrough (Spark rangeBetween is int)
        (
            f"SELECT dd, sum(n) OVER (ORDER BY n RANGE BETWEEN 2.5 PRECEDING "
            f"AND CURRENT ROW) AS s FROM ({DAILY}) t",
            "non-literal window frame offset",
        ),
        # RANGE with two order keys → passthrough
        (
            f"SELECT dd, sum(n) OVER (ORDER BY n, dd RANGE BETWEEN 2 "
            f"PRECEDING AND CURRENT ROW) AS s FROM ({DAILY}) t",
            "exactly one ORDER BY key",
        ),
        # explicit frame on a ranking function → passthrough (Spark's
        # analyzer rejects it)
        (
            f"SELECT dd, rank() OVER (ORDER BY dd ROWS BETWEEN 2 PRECEDING "
            f"AND CURRENT ROW) AS r FROM ({DAILY}) t",
            "explicit frame on window rank",
        ),
        # non-literal frame offset → passthrough
        (
            f"SELECT dd, sum(n) OVER (ORDER BY dd ROWS BETWEEN n PRECEDING "
            f"AND CURRENT ROW) AS s FROM ({DAILY}) t",
            "non-literal window frame offset",
        ),
        # aggregate inside the window spec above an outer GROUP BY
        (
            f"SELECT et, sum(n) AS s, rank() OVER (ORDER BY sum(n)) AS r "
            f"FROM ({TYPE_DAILY}) t GROUP BY et",
            "window spec",
        ),
        # window in outer WHERE / ORDER BY
        (
            f"SELECT dd, n FROM ({DAILY}) t "
            "ORDER BY rank() OVER (ORDER BY n)",
            "window function in ORDER BY",
        ),
    ],
)
def test_parse_window_unsupported(sql, msg):
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match=msg):
        parse_query(sql)


# -- behavior -----------------------------------------------------------


def test_window_topn_per_group_matches_plain(spark, qc_mem):
    # the classic dashboard shape: top-3 days per event type over a rollup,
    # rank computed in a middle derived level, filtered one level up
    sql = (
        "SELECT et, dd, n, rnk FROM ("
        "  SELECT et, dd, n, rank() OVER (PARTITION BY et ORDER BY n DESC, dd)"
        f"  AS rnk FROM ({TYPE_DAILY}) t) w "
        "WHERE rnk <= 3 ORDER BY et, rnk, dd"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_window_running_totals_match_plain(spark, qc_mem):
    sql = (
        "SELECT dd, n, sum(n) OVER (ORDER BY dd) AS cum, "
        "lag(n, 1) OVER (ORDER BY dd) AS prev, "
        "lead(n, 1, -1) OVER (ORDER BY dd) AS nxt, "
        "row_number() OVER (ORDER BY dd) AS rn, "
        f"count(*) OVER () AS days FROM ({DAILY}) t"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_window_partitioned_agg_and_ntile(spark, qc_mem):
    sql = (
        "SELECT et, dd, n, max(n) OVER (PARTITION BY et) AS mx, "
        "avg(n) OVER (PARTITION BY et) AS av, "
        "ntile(3) OVER (ORDER BY n, dd, et) AS bucket "
        f"FROM ({TYPE_DAILY}) t"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_window_shares_entry_with_bare_rollup(spark, qc_mem):
    qc_mem.config.override_now_ns = None
    qc_mem.sql(
        f"SELECT dd, n, rank() OVER (ORDER BY n DESC, dd) AS r FROM ({DAILY}) t"
    ).collect()
    assert qc_mem.last_decision.cached
    fp = qc_mem.last_decision.fingerprint
    qc_mem.sql(DAILY).collect()
    assert qc_mem.last_decision.cached and qc_mem.last_decision.cache_hit
    assert qc_mem.last_decision.fingerprint == fp


def test_window_above_outer_where(spark, qc_mem):
    # outer WHERE filters inner rows BEFORE the window evaluates (SQL
    # semantics: WHERE precedes window computation in the same SELECT)
    sql = (
        "SELECT dd, n, row_number() OVER (ORDER BY n DESC, dd) AS rn "
        f"FROM ({DAILY}) t WHERE n > 2"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_parse_rows_frame():
    from datafusion_query_cache_spark.plans.ir import SubquerySpec, WindowExpr
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        f"SELECT dd, avg(n) OVER (ORDER BY dd ROWS BETWEEN 6 PRECEDING "
        f"AND CURRENT ROW) AS ma7 FROM ({DAILY}) t"
    )
    assert isinstance(s, SubquerySpec)
    w = s.items[1].expr
    assert isinstance(w, WindowExpr) and w.frame == ("rows", -6, 0)
    # frame is part of the window's canonical form (distinct fingerprint
    # inputs for distinct frames), but the INNER fingerprint is unchanged
    assert "rows[-6,0]" in w.canon()
    assert s.inner.canon() == parse_query(DAILY).canon()


def test_window_moving_average_matches_plain(spark, qc_mem):
    # the moving-average dashboard: 7-day MA + 3-day sum over the daily
    # rollup — explicit ROWS frames replay post-finalize over O(state) rows
    sql = (
        "SELECT dd, n, "
        "round(avg(n) OVER (ORDER BY dd ROWS BETWEEN 6 PRECEDING AND "
        "CURRENT ROW) + 1e-9, 2) AS ma7, "
        "sum(n) OVER (ORDER BY dd ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        f" AS s3 FROM ({DAILY}) t ORDER BY dd"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_window_frame_variants_match_plain(spark, qc_mem):
    # unbounded/following/centered frames, partitioned, incl. value fns
    sql = (
        "SELECT et, dd, n, "
        "sum(n) OVER (PARTITION BY et ORDER BY dd ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND 1 FOLLOWING) AS cum_next, "
        "min(n) OVER (PARTITION BY et ORDER BY dd ROWS BETWEEN 1 PRECEDING "
        "AND 1 FOLLOWING) AS lo3, "
        "last_value(n) OVER (PARTITION BY et ORDER BY dd ROWS BETWEEN "
        "CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_n "
        f"FROM ({TYPE_DAILY}) t ORDER BY et, dd"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_parse_range_frame():
    from datafusion_query_cache_spark.plans.ir import SubquerySpec, WindowExpr
    from datafusion_query_cache_spark.plans.parser import parse_query

    s = parse_query(
        f"SELECT dd, sum(n) OVER (ORDER BY n RANGE BETWEEN 5 PRECEDING "
        f"AND CURRENT ROW) AS s FROM ({DAILY}) t"
    )
    assert isinstance(s, SubquerySpec)
    w = s.items[1].expr
    assert isinstance(w, WindowExpr) and w.frame == ("range", -5, 0)
    assert "range[-5,0]" in w.canon()


def test_window_range_frame_matches_plain(spark, qc_mem):
    # RANGE frames are peer-inclusive (tie-independent) — value-banded
    # running sums over the rollup's count column (BIGINT key)
    sql = (
        "SELECT et, dd, n, "
        "CAST(sum(n) OVER (PARTITION BY et ORDER BY n RANGE BETWEEN 5 "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS near, "
        "CAST(count(*) OVER (ORDER BY n RANGE BETWEEN 2 PRECEDING AND "
        "2 FOLLOWING) AS BIGINT) AS band "
        f"FROM ({TYPE_DAILY}) t ORDER BY et, dd"
    )
    out = _two_run(qc_mem, spark, sql)
    assert rows_set(out) == rows_set(spark.sql(sql))


def test_window_range_frame_non_numeric_key_passthrough(spark, qc_mem):
    # dd is a DATE: Spark's RangeFrame rejects it — must degrade to
    # passthrough (exact either way), not crash strict mode
    sql = (
        "SELECT dd, n, sum(n) OVER (ORDER BY dd RANGE BETWEEN 2 PRECEDING "
        f"AND CURRENT ROW) AS s FROM ({DAILY}) t"
    )
    qc_mem.config.override_now_ns = None
    out = qc_mem.sql(sql)
    assert not qc_mem.last_decision.cached
    assert "numeric order key" in qc_mem.last_decision.reason
    assert rows_set(out) == rows_set(spark.sql(sql))


# -- QUALIFY (r11: DuckDB extension, capability beyond passthrough) ------


def _duck_rows(spark, sql, views=("events",)):
    """Spark has no QUALIFY — expected values come from DuckDB."""
    import math

    import duckdb

    con = duckdb.connect()
    for v in views:
        con.register(v, spark.table(v).toPandas())
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


def test_qualify_filters_window_output(spark, qc_mem):
    sql = (
        "SELECT et, dd, n, rank() OVER (PARTITION BY et ORDER BY n DESC, dd)"
        f" AS rnk FROM ({TYPE_DAILY}) t QUALIFY rnk <= 3 ORDER BY et, dd"
    )
    out = _two_run(qc_mem, spark, sql)
    assert qc_mem.last_decision.cached
    assert rows_set(out) == _duck_rows(spark, sql)


def test_qualify_inline_window(spark, qc_mem):
    # window inline in QUALIFY, not aliased in the select list
    sql = (
        f"SELECT dd, n FROM ({DAILY}) t "
        "QUALIFY row_number() OVER (ORDER BY n DESC, dd) <= 5 ORDER BY dd"
    )
    out = _two_run(qc_mem, spark, sql)
    assert qc_mem.last_decision.cached
    assert rows_set(out) == _duck_rows(spark, sql)


def test_qualify_unsupported_shapes(spark, qc_mem):
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    # direct QUALIFY is supported since r13 when it references outputs;
    # an aggregate inside its window spec still refuses (restate the
    # aggregate through its alias instead: ORDER BY n)
    with pytest.raises(Unsupported, match="aggregate|QUALIFY"):
        parse_query(
            "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
            "QUALIFY rank() OVER (ORDER BY count(*)) <= 2"
        )
    # QUALIFY above an outer re-aggregation
    with pytest.raises(Unsupported, match="QUALIFY"):
        parse_query(
            f"SELECT et, sum(n) AS s FROM ({TYPE_DAILY}) t GROUP BY et "
            "QUALIFY rank() OVER (ORDER BY sum(n)) <= 2"
        )
    # QUALIFY referencing a non-projected inner column
    with pytest.raises(Unsupported, match="not a select output"):
        parse_query(
            f"SELECT dd FROM ({TYPE_DAILY}) t "
            "QUALIFY row_number() OVER (ORDER BY n) <= 2"
        )


def test_tablesample_not_silently_dropped():
    """r11 silent-drop audit: TABLESAMPLE/USING SAMPLE must degrade to
    passthrough (where Spark's own parser rules apply), never aggregate
    the full table while claiming the sampled result."""
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match="TABLESAMPLE|SAMPLE"):
        parse_query(
            "SELECT event_type, count(*) AS n FROM events "
            "TABLESAMPLE BERNOULLI(10) GROUP BY 1"
        )


def test_order_by_window_alias_same_level(spark, qc_mem):
    """ORDER BY the window's own alias (the natural spelling) resolves
    post-projection — no extra derived level needed (r11)."""
    sql = (
        "SELECT dd, n, rank() OVER (ORDER BY n DESC, dd) AS rnk "
        f"FROM ({DAILY}) t ORDER BY rnk"
    )
    out = _two_run(qc_mem, spark, sql)
    assert qc_mem.last_decision.cached
    assert rows_set(out) == rows_set(spark.sql(sql))
    # order itself must match (rnk is unique: full tie-break)
    assert [r["rnk"] for r in out.collect()] == sorted(
        r["rnk"] for r in out.collect()
    )


def test_order_by_mixed_alias_and_hidden_key_passthrough(spark, qc_mem):
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match="mixes"):
        parse_query(
            "SELECT dd, rank() OVER (ORDER BY n DESC, dd) AS rnk "
            f"FROM ({DAILY}) t ORDER BY rnk, n"
        )


def test_nth_value_and_ignore_nulls(spark, qc_mem):
    # nth_value parses in both engines; the IGNORE NULLS spelling is
    # duckdb-only syntax (Spark puts the clause outside the parens) —
    # DuckDB oracle for both
    sql = (
        "SELECT et, dd, n, "
        "nth_value(n, 2) OVER (PARTITION BY et ORDER BY dd) AS second_n, "
        "first_value(n IGNORE NULLS) OVER (PARTITION BY et ORDER BY dd "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fnn "
        f"FROM ({TYPE_DAILY}) t ORDER BY et, dd"
    )
    out = _two_run(qc_mem, spark, sql)
    assert qc_mem.last_decision.cached
    assert rows_set(out) == _duck_rows(spark, sql)


def test_ignore_nulls_on_lag_stays_passthrough():
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    with pytest.raises(Unsupported, match="IGNORE NULLS"):
        parse_query(
            f"SELECT dd, lag(n IGNORE NULLS) OVER (ORDER BY dd) AS p "
            f"FROM ({DAILY}) t"
        )


def test_moving_average_over_dynamic_bound(spark, qc_mem):
    """The live-dashboard widget: a 7-day MA over a SLIDING 10-day rollup —
    the dyn-bound inner refreshes incrementally (bucket-granular state),
    the frame replays post-finalize."""
    import datetime as dt

    now1 = int(dt.datetime(2024, 1, 26, tzinfo=dt.timezone.utc).timestamp() * 1e9)
    now2 = int(dt.datetime(2024, 1, 31, tzinfo=dt.timezone.utc).timestamp() * 1e9)
    sql = (
        "SELECT d, n, round(avg(n) OVER (ORDER BY d ROWS BETWEEN 6 "
        "PRECEDING AND CURRENT ROW) + 1e-9, 2) AS ma7 FROM "
        "(SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n "
        "FROM events WHERE ts > now() - INTERVAL 10 DAY GROUP BY 1) t "
        "ORDER BY d"
    )
    qc_mem.config.override_now_ns = now1
    qc_mem.sql(sql).collect()
    assert qc_mem.last_decision.cached
    qc_mem.config.override_now_ns = now2
    out = qc_mem.sql(sql)
    assert qc_mem.last_decision.cached and qc_mem.last_decision.cache_hit
    bounded = sql.replace(
        "ts > now() - INTERVAL 10 DAY",
        "ts > TIMESTAMP '2024-01-21 00:00:00'",
    )
    assert rows_set(out) == rows_set(spark.sql(bounded))


def test_named_window_clause(spark, qc_mem):
    """WINDOW w AS (...): duckdb resolves the named spec at parse time, so
    the lowering sees the inline form — no silent-drop risk."""
    sql = (
        "SELECT dd, n, rank() OVER w AS r FROM "
        f"({DAILY}) t WINDOW w AS (ORDER BY n DESC, dd)"
    )
    out = _two_run(qc_mem, spark, sql)
    assert qc_mem.last_decision.cached
    assert rows_set(out) == _duck_rows(spark, sql)


def test_direct_qualify_cached(spark, qc_mem):
    """r13: QUALIFY directly on an aggregate — desugared to the derived
    window-replay shape (cached aggregate + post-finalize window filter).
    Spark cannot parse QUALIFY, so the oracle is DuckDB."""
    import datetime as dt

    import duckdb
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    ev = spark.table("events")
    cut = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0])
    sql = (
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS n FROM events GROUP BY 1, 2 "
        "QUALIFY rank() OVER (PARTITION BY event_type ORDER BY n DESC, d) <= 3 "
        "ORDER BY event_type, d"
    )
    qc_mem.config.override_now_ns = cut
    ev.filter(F.col("ts_ns") < F.lit(cut)).createOrReplaceTempView("events")
    try:
        qc_mem.sql(sql).collect()
        assert qc_mem.last_decision.cached, qc_mem.last_decision.reason
        ev.createOrReplaceTempView("events")
        qc_mem.config.override_now_ns = cut + 10**18
        got = [tuple(r) for r in qc_mem.sql(sql).collect()]
        assert qc_mem.last_decision.cache_hit
    finally:
        ev.createOrReplaceTempView("events")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    exp = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == exp


def test_direct_qualify_refusals(qc_mem):
    qc_mem.config.override_now_ns = None
    from datafusion_query_cache_spark.plans.ir import Unsupported
    from datafusion_query_cache_spark.plans.parser import parse_query

    import pytest

    # QUALIFY referencing a non-output column
    with pytest.raises(Unsupported, match="QUALIFY"):
        parse_query(
            "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
            "QUALIFY rank() OVER (ORDER BY value) <= 2"
        )
    # aggregate inside QUALIFY
    with pytest.raises(Unsupported, match="QUALIFY|aggregate"):
        parse_query(
            "SELECT event_type, count(*) AS n FROM events GROUP BY 1 "
            "QUALIFY count(*) > 2"
        )

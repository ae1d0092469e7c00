"""Round-16 ADVICE regression pins.

1. FULL OUTER positional ORDER BY refuses out-of-range ordinals (Spark's
   ORDER_BY_POS_OUT_OF_RANGE stays authoritative — no silent Python
   negative indexing).
2. A driver-tier ingest failure in ContaminationIndex must leave the
   distributed fallback a PRISTINE meta (no half-appended parts →
   no lost increments / double counts).
3. The FULL OUTER composite pins ONE now() instant across its A/M
   sub-plans and the fresh anti side.
4. Spec memo: schema-consulting parses revalidate consulted schemas on
   every hit; schema-independent queries memoize even when they contain
   the substring 'natural'.
5. CTE names shadowing registered views are exempt from the
   qualified-ref membership check (membership unknown, never the VIEW's
   column set).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture()
def fo_dim16(spark):
    spark.range(30).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias(
            "segment"
        ),
    ).createOrReplaceTempView("r16_dim")
    yield
    spark.catalog.dropTempView("r16_dim")


@pytest.mark.parametrize("pos", [0, 3, -1, 99])
def test_full_order_by_position_out_of_range(qc, spark, fo_dim16, pos):
    q = (
        "SELECT segment, count(*) AS n FROM events FULL OUTER JOIN "
        f"r16_dim USING (user_id) GROUP BY segment ORDER BY {pos}"
    )
    with pytest.raises(Exception):
        qc.sql(q).collect()
    d = qc.last_decision
    assert not d.cached  # refused → passthrough → Spark's own error


def test_full_order_by_position_in_range(qc, spark, fo_dim16):
    q = (
        "SELECT segment, count(*) AS n FROM events FULL OUTER JOIN "
        "r16_dim USING (user_id) GROUP BY segment ORDER BY 2 DESC, 1"
    )
    got = qc.sql(q).collect()
    ref = spark.sql(q).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]
    assert qc.last_decision.cached


def test_contamination_driver_failure_leaves_meta_pristine(spark, tmp_path):
    """Kill the bench driver tier mid-write (after the bench part is
    appended to its local meta copy, before the score increments land):
    the distributed fallback must still produce exactly the batch
    scores — a half-mutated meta would anti-join the release to empty
    and silently lose the increments (r15 ADVICE medium)."""
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )
    from datafusion_query_cache_spark.operators.textstats import (
        contamination_scores,
    )

    docs = spark.table("documents").filter(F.col("doc_id") % 7 != 0)
    bench = (
        spark.table("documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "text")
    )

    idx = ContaminationIndex(str(tmp_path / "ct16"), k=8)
    idx.update(docs=docs)  # docs stored; no benchmark yet

    orig = idx._write_part_arrow
    calls = {"n": 0}

    def flaky(tbl, kind):
        if kind == "score":
            raise RuntimeError("injected driver-tier failure")
        calls["n"] += 1
        return orig(tbl, kind)

    idx._write_part_arrow = flaky
    try:
        got = idx.update(benchmark=bench)
    finally:
        idx._write_part_arrow = orig
    assert rows_set(got) == rows_set(contamination_scores(docs, bench, k=8))


def test_contamination_docs_driver_failure_no_double_count(spark, tmp_path):
    """Same discipline on the docs tier: a failure after the docsh part
    write must not leave the part in meta (the fallback would append it
    again → future releases double-count)."""
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )
    from datafusion_query_cache_spark.operators.textstats import (
        contamination_scores,
    )

    docs = spark.table("documents").filter(F.col("doc_id") % 7 != 0)
    bench = (
        spark.table("documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "text")
    )
    idx = ContaminationIndex(str(tmp_path / "ct16b"), k=8)

    orig = idx._write_part_arrow

    def flaky(tbl, kind):
        if kind == "score":
            raise RuntimeError("injected driver-tier failure")
        return orig(tbl, kind)

    idx._write_part_arrow = flaky
    try:
        idx.update(docs=docs)  # docs tier fails mid-way → distributed
    finally:
        idx._write_part_arrow = orig
    got = idx.update(benchmark=bench)  # later release increments stored docs
    assert rows_set(got) == rows_set(contamination_scores(docs, bench, k=8))


def test_full_outer_composite_shares_one_now(qc, spark, fo_dim16, monkeypatch):
    """Every _now_ns() taken while planning the FULL composite must
    return the SAME instant (sub-plans + anti side), even when the
    wall clock advances between calls."""
    import datafusion_query_cache_spark.session as sess_mod

    tick = {"v": 1_700_000_000_000_000_000}

    def fake_ns():
        tick["v"] += 1_000_000_000  # 1s per call: any re-read diverges
        return tick["v"]

    monkeypatch.setattr(sess_mod.time, "time_ns", fake_ns)

    seen = []
    orig = type(qc)._now_ns

    def spy(self):
        v = orig(self)
        seen.append(v)
        return v

    monkeypatch.setattr(type(qc), "_now_ns", spy)
    q = (
        "SELECT segment, count(*) AS n FROM events FULL OUTER JOIN "
        "r16_dim USING (user_id) GROUP BY segment"
    )
    qc.sql(q).collect()
    # the pin itself is taken with one wall-clock read; every later call
    # during the composite must echo it
    assert len(set(seen)) <= 2 and len(seen) >= 3
    assert qc._now_pin is None  # restored


def test_spec_memo_revalidates_consulted_schemas(qc, spark):
    spark.range(20).select(
        F.col("id").alias("user_id"), F.lit(1.5).alias("w")
    ).createOrReplaceTempView("r16_nat")
    try:
        q = (
            "SELECT user_id, count(*) AS n FROM events NATURAL JOIN "
            "r16_nat GROUP BY user_id"
        )
        a1 = rows_set(qc.sql(q))
        assert a1 == rows_set(spark.sql(q))
        # re-register with a different column set: the memoized spec's
        # consulted schemas no longer match → re-parse, fresh common set
        spark.range(20).select(
            F.col("id").alias("user_id"),
            (F.col("id") * 2.0).alias("val"),
        ).createOrReplaceTempView("r16_nat")
        a2 = rows_set(qc.sql(q))
        assert a2 == rows_set(spark.sql(q))
    finally:
        spark.catalog.dropTempView("r16_nat")


def test_spec_memo_keeps_schema_independent_natural_literal(qc):
    q = "SELECT count(*) AS n FROM events WHERE event_type <> 'natural'"
    qc.sql(q).collect()
    assert q in qc._spec_cache  # old substring guard no longer blocks


def test_cte_shadowing_view_membership_unknown(qc, spark):
    """A CTE shadowing a registered view: qualified refs resolve against
    the CTE's OWN columns. The engine must answer (no spurious refusal
    against the view's schema) and match Spark exactly."""
    q = (
        "WITH events AS "
        "(SELECT l_orderkey AS k, l_quantity AS v FROM lineitem) "
        "SELECT e.k AS k, sum(e.v) AS s FROM events e GROUP BY e.k"
    )
    assert rows_set(qc.sql(q)) == rows_set(spark.sql(q))


def test_cte_shadowing_view_bad_column_still_refused(qc, spark):
    q = (
        "WITH events AS "
        "(SELECT l_orderkey AS k, l_quantity AS v FROM lineitem) "
        "SELECT e.user_id AS u, sum(e.v) AS s FROM events e GROUP BY e.user_id"
    )
    with pytest.raises(Exception):
        qc.sql(q).collect()
    with pytest.raises(Exception):
        spark.sql(q).collect()

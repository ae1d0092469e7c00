"""Partial-state algebra laws (SURVEY §5.3).

Split-invariance: for every supported aggregate,
``finalize(merge(partial(D1), partial(D2))) == agg(D1 ∪ D2)`` — including
null and empty-split edge cases (Spark's ``avg`` ignores nulls, ``count(*)``
doesn't; SURVEY §7 hard-part 1).

Property-based over generated frames via hypothesis (driven through pandas →
Spark).  These tests exercise the algebra in isolation from the SQL
front-end and the cache.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from datafusion_query_cache_spark.functions.partial import (
    NotDecomposable,
    decompose_agg,
    relax_nullability,
)
from datafusion_query_cache_spark.plans.ir import AggCall, Col, Lit, Star

AGGS = [
    AggCall("count", (Star(),)),
    AggCall("count", (Col("v"),)),
    AggCall("sum", (Col("v"),)),
    AggCall("min", (Col("v"),)),
    AggCall("max", (Col("v"),)),
    AggCall("avg", (Col("v"),)),
    AggCall("var_samp", (Col("v"),)),
    AggCall("var_pop", (Col("v"),)),
    AggCall("stddev_samp", (Col("v"),)),
    AggCall("stddev_pop", (Col("v"),)),
    AggCall("median", (Col("v"),)),
    AggCall("percentile", (Col("v"), Lit(0.9))),
]

SPARK_EQUIV = {
    "count": lambda: F.count(F.lit(1)),
    "sum": lambda: F.sum("v"),
    "min": lambda: F.min("v"),
    "max": lambda: F.max("v"),
    "avg": lambda: F.avg("v"),
    "var_samp": lambda: F.var_samp("v"),
    "var_pop": lambda: F.var_pop("v"),
    "stddev_samp": lambda: F.stddev_samp("v"),
    "stddev_pop": lambda: F.stddev_pop("v"),
    "median": lambda: F.median("v"),
    "percentile": lambda: F.percentile("v", 0.9),
}


def spark_truth_expr(agg: AggCall):
    if agg.fn == "count" and isinstance(agg.args[0], Star):
        return F.count(F.lit(1))
    if agg.fn == "count":
        return F.count("v")
    return SPARK_EQUIV[agg.fn]()


def run_split(spark, agg: AggCall, d1, d2, keys):
    """Compute agg via partial(D1) ∪ partial(D2) → merge → finalize, and
    directly on D1∪D2 with Spark's own aggregate; return both results."""
    dec = decompose_agg(agg, "0")
    schema = "g int, v double"
    df1 = spark.createDataFrame(pd.DataFrame(d1, columns=["g", "v"]), schema=schema)
    df2 = spark.createDataFrame(pd.DataFrame(d2, columns=["g", "v"]), schema=schema)
    gb = ["g"] if keys else []

    def partial(df):
        return df.groupBy(*gb).agg(*[c.alias(n) for n, c in dec.partial.items()])

    unioned = partial(df1).unionByName(partial(df2))
    merged = unioned.groupBy(*gb).agg(*[c.alias(n) for n, c in dec.merge.items()])
    ours = merged.select(*gb, dec.finalize.alias("r"))

    truth = (
        df1.unionByName(df2).groupBy(*gb).agg(spark_truth_expr(agg).alias("r"))
    )
    key = (lambda r: (r["g"] is None, r["g"])) if keys else (lambda r: 0)
    return (
        sorted(ours.collect(), key=key),
        sorted(truth.collect(), key=key),
    )


def assert_rows_close(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) or math.isnan(vb):
                    assert math.isnan(va) == math.isnan(vb)
                else:
                    assert va == pytest.approx(vb, rel=1e-9, abs=1e-9)
            else:
                assert va == vb


rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
    ),
    min_size=0,
    max_size=12,
)


@pytest.mark.parametrize("agg", AGGS, ids=lambda a: a.canon())
@given(d1=rows, d2=rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_invariance(spark, agg, d1, d2):
    if not d1 and not d2:
        return
    ours, truth = run_split(spark, agg, d1, d2, keys=True)
    assert_rows_close(ours, truth)


@pytest.mark.parametrize("agg", AGGS, ids=lambda a: a.canon())
def test_split_invariance_global_and_empty_split(spark, agg):
    # global (no group-by) aggregate with one empty side — the empty-input
    # edge the reference never exercises but Spark semantics force us to get
    # right (count=0 row vs no row).
    d1 = [(0, 1.0), (1, None), (1, 3.5)]
    d2 = []
    ours, truth = run_split(spark, agg, d1, d2, keys=False)
    assert_rows_close(ours, truth)


def test_distinct_not_decomposable():
    with pytest.raises(NotDecomposable):
        decompose_agg(AggCall("sum", (Col("v"),), distinct=True), "0")
    with pytest.raises(NotDecomposable):
        decompose_agg(AggCall("mode", (Col("v"),)), "0")
    with pytest.raises(NotDecomposable):
        # non-literal fraction has no stable state shape
        decompose_agg(AggCall("percentile", (Col("v"), Col("p"))), "0")


def test_merge_idempotent_names():
    # merge output column names == state column names → refresh N times works
    dec = decompose_agg(AggCall("avg", (Col("v"),)), "7")
    assert set(dec.partial.keys()) == set(dec.merge.keys())
    assert all(n.startswith("__qc7_") for n in dec.partial)


@pytest.mark.parametrize("agg", AGGS, ids=lambda a: "sgl-" + a.canon())
def test_singleton_equals_partial(spark, agg):
    """The singleton-row path (used by the one-shuffle warm refresh) must
    produce the same state as an explicit partial aggregate."""
    dec = decompose_agg(agg, "0")
    if dec.singleton is None:
        pytest.skip("no singleton form")
    d1 = [(0, 1.5), (0, None), (1, -2.0), (1, 7.25), (2, 0.0)]
    d2 = [(0, 3.125), (2, None), (3, 9.0)]
    schema = "g int, v double"
    df1 = spark.createDataFrame(pd.DataFrame(d1, columns=["g", "v"]), schema)
    df2 = spark.createDataFrame(pd.DataFrame(d2, columns=["g", "v"]), schema)

    p1 = df1.groupBy("g").agg(*[c.alias(n) for n, c in dec.partial.items()])
    dtypes = {f.name: relax_nullability(f.dataType) for f in p1.schema.fields}
    s2 = df2.select(
        "g", *[c.cast(dtypes[n]).alias(n) for n, c in dec.singleton.items()]
    )
    via_singleton = (
        p1.unionByName(s2)
        .groupBy("g")
        .agg(*[c.alias(n) for n, c in dec.merge.items()])
        .select("g", dec.finalize.alias("r"))
    )
    truth = (
        df1.unionByName(df2).groupBy("g").agg(spark_truth_expr(agg).alias("r"))
    )
    key = lambda r: r["g"]
    assert_rows_close(
        sorted(via_singleton.collect(), key=key), sorted(truth.collect(), key=key)
    )


def test_collect_set_split_invariance(spark):
    """collect_set merge = array_distinct ∘ flatten: the merged set equals
    the set over the union, compared order-insensitively (set order is
    engine-arbitrary by definition)."""
    dec = decompose_agg(AggCall("collect_set", (Col("v"),)), "0")
    d1 = [(0, 1.0), (0, 2.0), (0, None), (1, 5.0), (1, 5.0)]
    d2 = [(0, 2.0), (0, 3.0), (1, None), (2, 7.0)]
    schema = "g int, v double"
    df1 = spark.createDataFrame(pd.DataFrame(d1, columns=["g", "v"]), schema)
    df2 = spark.createDataFrame(pd.DataFrame(d2, columns=["g", "v"]), schema)

    def partial(df):
        return df.groupBy("g").agg(*[c.alias(n) for n, c in dec.partial.items()])

    merged = (
        partial(df1)
        .unionByName(partial(df2))
        .groupBy("g")
        .agg(*[c.alias(n) for n, c in dec.merge.items()])
        .select("g", F.array_sort(dec.finalize).alias("r"))
    )
    truth = (
        df1.unionByName(df2)
        .groupBy("g")
        .agg(F.array_sort(F.collect_set("v")).alias("r"))
    )
    key = lambda r: r["g"]
    assert sorted(merged.collect(), key=key) == sorted(truth.collect(), key=key)


def test_collect_set_singleton_equals_partial(spark):
    from pyspark.sql.types import ArrayType

    dec = decompose_agg(AggCall("collect_set", (Col("v"),)), "0")
    assert dec.singleton is not None
    d1 = [(0, 1.0), (0, 2.0), (1, 5.0)]
    d2 = [(0, 2.0), (0, None), (2, 7.0)]
    schema = "g int, v double"
    df1 = spark.createDataFrame(pd.DataFrame(d1, columns=["g", "v"]), schema)
    df2 = spark.createDataFrame(pd.DataFrame(d2, columns=["g", "v"]), schema)
    p1 = df1.groupBy("g").agg(*[c.alias(n) for n, c in dec.partial.items()])
    # same nullability relaxation the session applies: array state stores
    # containsNull=false, and a nullable→non-null array cast is refused
    dtypes = {
        f.name: (
            ArrayType(f.dataType.elementType, True)
            if isinstance(f.dataType, ArrayType)
            else f.dataType
        )
        for f in p1.schema.fields
    }
    s2 = df2.select(
        "g", *[c.cast(dtypes[n]).alias(n) for n, c in dec.singleton.items()]
    )
    got = (
        p1.unionByName(s2)
        .groupBy("g")
        .agg(*[c.alias(n) for n, c in dec.merge.items()])
        .select("g", F.array_sort(dec.finalize).alias("r"))
    )
    truth = (
        df1.unionByName(df2)
        .groupBy("g")
        .agg(F.array_sort(F.collect_set("v")).alias("r"))
    )
    key = lambda r: r["g"]
    assert sorted(got.collect(), key=key) == sorted(truth.collect(), key=key)


def test_py_central_merge_mirrors_spark_fold(spark):
    """The lite-tier Python mirror of the central-moment fold must agree
    with the Spark-side collect_list+aggregate merge on random states
    (order-sensitive fp ops aside — compare to 1e-9 relative)."""
    import random

    from datafusion_query_cache_spark.functions.partial import decompose_agg
    from datafusion_query_cache_spark.plans.ir import AggCall, Col

    rng = random.Random(20260815)
    for fn, nargs in [("var_samp", 1), ("skewness", 1), ("kurtosis", 1),
                      ("corr", 2)]:
        args = (Col("v"),) if nargs == 1 else (Col("v"), Col("w"))
        dec = decompose_agg(AggCall(fn, args), "0")
        cols = list(dec.partial.keys())
        # random plausible states: derive them from REAL partials over
        # random data splits so they satisfy the moment invariants
        data = [
            (1, rng.uniform(-100, 100), rng.uniform(-5, 5))
            for _ in range(400)
        ] + [(2, rng.uniform(1e6, 1e6 + 10), rng.uniform(0, 1))
             for _ in range(100)]
        df = spark.createDataFrame(data, "g int, v double, w double")
        halves = [df.filter(F.col("v") >= 0), df.filter(F.col("v") < 0)]
        parts = [
            h.groupBy("g").agg(*[c.alias(n) for n, c in dec.partial.items()])
            for h in halves
        ]
        # Spark-side merge of the two state rows per group
        merged = (
            parts[0].unionByName(parts[1]).groupBy("g")
            .agg(*[c.alias(n) for n, c in dec.merge.items()])
        )
        spark_rows = {r["g"]: {n: r[n] for n in cols} for r in merged.collect()}
        # Python-side fold of the same two state rows
        p0 = {r["g"]: {n: r[n] for n in cols} for r in parts[0].collect()}
        p1 = {r["g"]: {n: r[n] for n in cols} for r in parts[1].collect()}
        for g in spark_rows:
            a, b = p0.get(g), p1.get(g)
            py = dec.py_merge(a, b) if (a and b) else (a or b)
            for n in cols:
                sv, pv = spark_rows[g][n], py[n]
                if sv is None or pv is None:
                    assert sv == pv, (fn, g, n)
                    continue
                denom = max(abs(float(sv)), 1e-9)
                assert abs(float(sv) - float(pv)) / denom < 1e-9 or \
                    abs(float(sv) - float(pv)) < 1e-9, (fn, g, n, sv, pv)
        # finalize mirrors too
        fin_rows = merged.select("g", dec.finalize.alias("r")).collect()
        for r in fin_rows:
            a, b = p0.get(r["g"]), p1.get(r["g"])
            py = dec.py_merge(a, b) if (a and b) else (a or b)
            pf = dec.py_finalize(py)
            sv = r["r"]
            if sv is None or pf is None:
                assert sv == pf, (fn, r["g"], sv, pf)
            else:
                denom = max(abs(float(sv)), 1e-9)
                assert abs(float(sv) - float(pf)) / denom < 1e-7, (
                    fn, r["g"], sv, pf,
                )

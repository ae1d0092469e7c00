"""Two-column aggregate (corr/covar/min_by) split-invariance tests."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from datafusion_query_cache_spark.functions.partial import decompose_agg
from datafusion_query_cache_spark.plans.ir import AggCall, Col

CASES = [
    (AggCall("corr", (Col("v"), Col("w"))), lambda: F.corr("v", "w")),
    (AggCall("covar_samp", (Col("v"), Col("w"))), lambda: F.covar_samp("v", "w")),
    (AggCall("covar_pop", (Col("v"), Col("w"))), lambda: F.covar_pop("v", "w")),
    (AggCall("min_by", (Col("v"), Col("w"))), lambda: F.min_by("v", "w")),
    (AggCall("max_by", (Col("v"), Col("w"))), lambda: F.max_by("v", "w")),
]

D1 = [
    (0, 1.0, 2.0),
    (0, 2.0, 1.0),
    (0, None, 5.0),
    (1, 3.0, None),
    (1, 4.0, 4.0),
    (1, 5.0, 1.0),
]
D2 = [
    (0, 7.0, 3.0),
    (1, 1.0, 9.0),
    (2, 2.0, 2.0),
    (2, 4.0, 8.0),
]


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


@pytest.mark.parametrize("agg,truth", CASES, ids=lambda c: getattr(c, "fn", "f"))
def test_two_column_split_invariance(spark, agg, truth):
    dec = decompose_agg(agg, "0")
    schema = "g int, v double, w double"
    df1 = spark.createDataFrame(pd.DataFrame(D1, columns=["g", "v", "w"]), schema)
    df2 = spark.createDataFrame(pd.DataFrame(D2, columns=["g", "v", "w"]), schema)

    def partial(df):
        return df.groupBy("g").agg(*[c.alias(n) for n, c in dec.partial.items()])

    merged = (
        partial(df1)
        .unionByName(partial(df2))
        .groupBy("g")
        .agg(*[c.alias(n) for n, c in dec.merge.items()])
    )
    ours = {
        r["g"]: norm(r["r"])
        for r in merged.select("g", dec.finalize.alias("r")).collect()
    }
    want = {
        r["g"]: norm(r["r"])
        for r in df1.unionByName(df2).groupBy("g").agg(truth().alias("r")).collect()
    }
    assert set(ours) == set(want)
    for g in want:
        a, b = ours[g], want[g]
        if isinstance(a, float) and isinstance(b, float):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-9), (g, a, b)
        else:
            assert a == b, (g, a, b)


def test_singleton_matches_partial(spark):
    """singleton(row)-then-merge must equal partial-then-merge.

    min_by is the two-column family that still carries a singleton form;
    corr/covar moved to central co-moment state (r11), which deliberately
    has NO singleton (the collect_list fold merge must see O(1) rows per
    group) — their per-row path is covered by split-invariance above."""
    agg = AggCall("min_by", (Col("v"), Col("w")))
    dec = decompose_agg(agg, "0")
    assert dec.singleton is not None
    schema = "g int, v double, w double"
    df1 = spark.createDataFrame(pd.DataFrame(D1, columns=["g", "v", "w"]), schema)
    df2 = spark.createDataFrame(pd.DataFrame(D2, columns=["g", "v", "w"]), schema)
    p1 = df1.groupBy("g").agg(*[c.alias(n) for n, c in dec.partial.items()])
    dtypes = {f.name: f.dataType for f in p1.schema.fields}
    s2 = df2.select(
        "g", *[c.cast(dtypes[n]).alias(n) for n, c in dec.singleton.items()]
    )
    merged = (
        p1.unionByName(s2)
        .groupBy("g")
        .agg(*[c.alias(n) for n, c in dec.merge.items()])
        .select("g", dec.finalize.alias("r"))
    )
    truth = df1.unionByName(df2).groupBy("g").agg(F.min_by("v", "w").alias("r"))
    got = {r["g"]: norm(r["r"]) for r in merged.collect()}
    want = {r["g"]: norm(r["r"]) for r in truth.collect()}
    for g in want:
        if isinstance(want[g], float) and isinstance(got[g], float):
            assert got[g] == pytest.approx(want[g], rel=1e-9)
        else:
            assert got[g] == want[g]


def test_corr_no_singleton_by_design():
    """The central co-moment families must NOT grow a singleton form: with
    one, the one-shuffle plan would feed one state row per raw fresh row
    into the collect_list fold merge (unbounded arrays per group)."""
    for fn in ("corr", "covar_samp", "covar_pop"):
        dec = decompose_agg(AggCall(fn, (Col("v"), Col("w"))), "0")
        assert dec.singleton is None
    for fn in ("var_pop", "stddev_samp", "skewness", "kurtosis"):
        dec = decompose_agg(AggCall(fn, (Col("v"),)), "0")
        assert dec.singleton is None

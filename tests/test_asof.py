"""As-of join semantics tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from datafusion_query_cache_spark.operators.asof import asof_join


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 5],
                "k": ["a", "a", "a", "b", "c"],
                "ts": [ts(1), ts(3), ts(5), ts(2), ts(9)],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "ts": [ts(2), ts(5), ts(4)],
                "px": [10.0, 20.0, 30.0],
            }
        )
    )
    return left, right


def test_asof_basic(spark, frames):
    left, right = frames
    out = {
        r["id"]: r["px"]
        for r in asof_join(left, right, "ts", "k", ["px"]).collect()
    }
    assert out == {
        1: None,  # before any right row
        2: 10.0,  # ts(3) → right ts(2)
        3: 20.0,  # ts(5) == right ts(5): inclusive tie
        4: None,  # key b: right ts(4) is after left ts(2)
        5: None,  # key c: no right rows
    }


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = {
        r["id"]: r["px"]
        for r in asof_join(
            left, right, "ts", "k", ["px"], tolerance_seconds=3600
        ).collect()
    }
    # id=2: left ts(3) - right ts(2) = 1h → inside; id=3: 0s → inside
    assert out[2] == 10.0 and out[3] == 20.0
    # widen left: a left row far after the last right row is out of tolerance
    far = spark.createDataFrame(
        pd.DataFrame({"id": [9], "k": ["a"], "ts": [ts(23)]})
    )
    out2 = asof_join(far, right, "ts", "k", ["px"], tolerance_seconds=3600).collect()
    assert out2[0]["px"] is None


def test_asof_one_shuffle(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, "ts", "k", ["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # hash partition by key, nothing else

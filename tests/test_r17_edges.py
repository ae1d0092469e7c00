"""Adversarial edges for the r17 composite vocabulary: eps-change
isolation for approx histograms, single-row groups for moments,
zero-pair halves for co-moments, DISTINCT-fold HAVING composition."""

from __future__ import annotations

import datetime as dt
import math
import tempfile

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


def _mk(spark, tmp, **kw):
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )

    return CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(tmp),
            default_temporal_column="ts",
            **kw,
        ),
    )


@pytest.fixture()
def fo(spark):
    spark.range(30).select(
        (F.col("id") + 500).alias("uid"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("seg"),
    ).unionByName(
        spark.range(10).select(
            F.col("id").alias("uid"),
            F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias(
                "seg"
            ),
        )
    ).createOrReplaceTempView("r17_dim")
    yield
    spark.catalog.dropTempView("r17_dim")


def test_approx_eps_change_is_new_entry_not_mixed_bins(spark, tmp_path, fo):
    """Changing approx_percentile_eps mid-stream must produce a NEW cold
    entry (the eps literal rides the fingerprint), never merge state
    binned under two layouts."""
    sql = (
        "SELECT seg, approx_percentile(value, 0.9) AS p90, count(*) AS n "
        "FROM events FULL JOIN r17_dim ON user_id = uid "
        "GROUP BY 1 ORDER BY 1"
    )
    qc = _mk(spark, str(tmp_path / "c1"))
    qc.sql(sql).collect()
    assert qc.last_decision.cached
    fp1 = qc.last_decision.fingerprint
    got1 = {r[0]: r[1] for r in qc.sql(sql).collect()}
    qc.config.approx_percentile_eps = 0.05
    qc.sql(sql).collect()
    fp2 = qc.last_decision.fingerprint
    assert fp1 != fp2, "eps change must re-fingerprint the composite"
    # both layouts stay self-consistent: re-running each eps reproduces
    # its own estimate exactly
    got2 = {r[0]: r[1] for r in qc.sql(sql).collect()}
    qc.config.approx_percentile_eps = 0.01
    got1b = {r[0]: r[1] for r in qc.sql(sql).collect()}
    assert got1 == got1b
    for k in got1:
        # different bin layouts give different (but close) estimates
        assert math.isclose(got1[k], got2[k], rel_tol=0.2)


def test_single_row_groups_moments_parity(spark, tmp_path):
    """Groups of size 1 (m2 = 0): skew/kurt/var NULL like plain Spark;
    corr NaN for n=1... the composite must match Spark's NULL/NaN
    surface exactly on degenerate groups."""
    spark.range(6).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5 + 10).alias("v"),
        (F.col("id") % 2).cast("double").alias("w"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id")
        ).alias("ts"),
    ).createOrReplaceTempView("tiny_fact")
    spark.range(8).select(
        F.col("id").alias("k2"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("lbl"),
    ).createOrReplaceTempView("tiny_dim")
    try:
        sql = (
            "SELECT lbl, skewness(v) AS sk, kurtosis(v) AS ku, "
            "var_samp(v) AS vs, corr(v, w) AS co, "
            "covar_samp(v, w) AS cs, median(v) AS md, count(*) AS n "
            "FROM tiny_fact FULL JOIN tiny_dim ON k = k2 "
            "GROUP BY 1 ORDER BY 1"
        )
        qc = _mk(spark, str(tmp_path / "c2"))
        got = sorted(tuple(r) for r in qc.sql(sql).collect())
        assert qc.last_decision.cached, qc.last_decision.reason
        want = sorted(tuple(r) for r in spark.sql(sql).collect())
        for ga, wa in zip(got, want):
            for x, y in zip(ga, wa):
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) or math.isnan(y):
                        assert math.isnan(x) and math.isnan(y), (ga, wa)
                    else:
                        assert math.isclose(
                            x, y, rel_tol=1e-9, abs_tol=1e-9
                        )
                else:
                    assert x == y, (ga, wa)
    finally:
        spark.catalog.dropTempView("tiny_fact")
        spark.catalog.dropTempView("tiny_dim")


def test_zero_pair_half_comoment_two_run(spark, tmp_path, fo):
    """A run-1 half where EVERY pair is invalid (y all NULL) leaves a
    zero co-moment struct; run 2 brings real pairs — the fold must pass
    the empty half through (the n1==0 branch)."""
    ev = spark.table("events")
    cut_us = int(ev.approxQuantile("ts_ns", [0.5], 0.0)[0]) // 1000
    cut_ns = cut_us * 1000
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_us)
    # y column: NULL before the cut, real after
    aug = ev.withColumn(
        "y2",
        F.when(F.col("ts") >= F.lit(cut), F.col("value") * 2 + 1),
    )
    sql = (
        "SELECT seg, round(corr(value, y2) + 1e-9, 6) AS co, "
        "regr_count(y2, value) AS rc, count(*) AS n "
        "FROM ev17 FULL JOIN r17_dim ON user_id = uid "
        "GROUP BY 1 ORDER BY 1"
    )
    try:
        aug.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView(
            "ev17"
        )
        qc = _mk(spark, str(tmp_path / "c3"), override_now_ns=cut_ns)
        qc.sql(sql).collect()
        assert qc.last_decision.cached, qc.last_decision.reason
        aug.createOrReplaceTempView("ev17")
        qc.config.override_now_ns = cut_ns + 10**17
        got = qc.sql(sql)
        assert qc.last_decision.cache_hit
        assert rows_set(got) == rows_set(spark.sql(sql))
    finally:
        spark.catalog.dropTempView("ev17")


def test_distinct_fold_in_having(spark, tmp_path, fo):
    """sum(DISTINCT) referenced from HAVING compiles through the same
    __qc_set_sum output fold over the merged frame."""
    sql = (
        "SELECT seg, sum(DISTINCT user_id) AS su, count(*) AS n "
        "FROM events FULL JOIN r17_dim ON user_id = uid "
        "GROUP BY 1 HAVING sum(DISTINCT user_id) > 0 OR count(value) = 0 "
        "ORDER BY 1"
    )
    qc = _mk(spark, str(tmp_path / "c4"))
    got = qc.sql(sql)
    assert qc.last_decision.cached, qc.last_decision.reason
    assert rows_set(got) == rows_set(spark.sql(sql))

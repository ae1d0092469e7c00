"""Unit-normalization contract (VERDICT r2 items 1/4): every temporal source
column — epoch-ns long, µs TIMESTAMP, TIMESTAMP_NTZ — must come out of
``with_ns_shadow`` as the same (TimestampType ``c``, long ``c_ns``) pair with
identical values, so no downstream code can break on the writer's time unit.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

EPOCH_US = [1_704_067_200_000_000, 1_704_070_800_123_456, 1_704_153_600_999_999]


def _write(tmp_path, name, arrow_type):
    unit = arrow_type.unit
    scale = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1}[unit]
    vals = [u // scale * (1000 if unit == "ns" else 1) for u in EPOCH_US]
    ts = pa.array(vals, type=pa.int64()).cast(arrow_type)
    t = pa.table({"id": pa.array([1, 2, 3], type=pa.int64()), "ts": ts})
    p = str(tmp_path / name)
    pq.write_table(t, p)
    return p


@pytest.mark.parametrize(
    "unit", ["ns", "us", "ms"]
)
def test_shadow_identical_across_units(spark, tmp_path, unit):
    from datafusion_query_cache_spark.sources.tables import register_parquet_view

    p = _write(tmp_path, f"t_{unit}.parquet", pa.timestamp(unit))
    df = register_parquet_view(spark, f"shadow_{unit}", p)
    assert [f.simpleString() for f in df.schema.fields] == [
        "id:bigint",
        "ts:timestamp",
        "ts_ns:bigint",
    ]
    rows = sorted(df.select("id", "ts", "ts_ns").collect(), key=lambda r: r["id"])
    expect_us = EPOCH_US if unit != "ms" else [u // 1000 * 1000 for u in EPOCH_US]
    for r, us in zip(rows, expect_us):
        assert r["ts_ns"] == us * 1000
        got_us = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        assert got_us == us


def test_shadow_on_tz_aware_us(spark, tmp_path):
    """isAdjustedToUTC µs parquet (what Spark itself writes) normalizes the
    same way."""
    from datafusion_query_cache_spark.sources.tables import register_parquet_view

    p = _write(tmp_path, "t_tz.parquet", pa.timestamp("us", tz="UTC"))
    df = register_parquet_view(spark, "shadow_tz", p)
    vals = sorted(r["ts_ns"] for r in df.select("ts_ns").collect())
    assert vals == [u * 1000 for u in EPOCH_US]


def test_engine_flow_on_ntz_fixture(spark, tmp_path):
    """The flagship two-run cache flow end-to-end on a freshly-written NTZ
    parquet source: warm hit must match plain SQL exactly — the failure mode
    that killed round 2 can't recur silently."""
    from datafusion_query_cache_spark import (
        CachedSparkSession,
        ParquetQueryCache,
        QueryCacheConfig,
    )
    from datafusion_query_cache_spark.sources.tables import register_parquet_view

    n = 5000
    base = 1_704_067_200_000_000
    pdf = pd.DataFrame(
        {
            "ts": pd.Series(
                [base + i * 61_000_000 for i in range(n)], dtype="int64"
            ).map(lambda u: pd.Timestamp(u, unit="us")),
            "k": [i % 7 for i in range(n)],
            "v": [float(i % 100) for i in range(n)],
        }
    )
    p = str(tmp_path / "ntz_events.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False).set_column(
            0, "ts", pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("us"))
        ),
        p,
    )
    ev = register_parquet_view(spark, "ntz_events", p)
    cut_ns = int(ev.approxQuantile("ts_ns", [0.6], 0.0)[0])
    cut = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=cut_ns // 1000)

    sql = (
        "SELECT k, date_trunc('hour', ts) AS h, count(*) AS n, "
        "round(sum(v), 2) AS sv FROM ntz_view GROUP BY 1, 2"
    )
    qc = CachedSparkSession(
        spark,
        QueryCacheConfig(
            cache=ParquetQueryCache(str(tmp_path / "qc")),
            default_temporal_column="ts",
            override_now_ns=cut_ns,
        ),
    )
    ev.filter(F.col("ts") < F.lit(cut)).createOrReplaceTempView("ntz_view")
    qc.sql(sql).collect()  # populating miss
    ev.createOrReplaceTempView("ntz_view")
    qc.config.override_now_ns = cut_ns + 10**15
    got = sorted(map(tuple, qc.sql(sql).collect()))
    want = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want

"""Structured Streaming analogue tests (SURVEY §7.6).

The streaming windowed aggregate over the full testdata must agree with the
equivalent batch aggregate — the same oracle shape as the batch cache's
metamorphic test, with Spark's own state store doing the merging.
"""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, rows_set


@pytest.fixture()
def events_dir(tmp_path):
    """A directory the file-source can watch, seeded with the events file."""
    d = tmp_path / "stream-src"
    d.mkdir()
    shutil.copy(
        os.path.join(SF_DIR, "events.parquet"), d / "events-0.parquet"
    )
    return str(d)


def test_windowed_aggregate_matches_batch(spark, events_dir, tmp_path):
    from datafusion_query_cache_spark.streaming.incremental import (
        parquet_stream,
        run_available_now,
        windowed_aggregate,
    )

    stream = parquet_stream(spark, events_dir, ns_timestamp_columns=["ts"])
    agg = windowed_aggregate(
        stream,
        ts_col="ts",
        window_duration="1 hour",
        group_cols=["event_type"],
        agg_exprs={
            "n": F.count(F.lit(1)),
            "s": F.round(F.sum("value"), 2),
        },
        watermark_delay="1 hour",
    )
    run_available_now(agg, "stream_hourly", str(tmp_path / "ckpt"), "complete")

    got = spark.sql("SELECT bucket, event_type, n, s FROM stream_hourly")
    from datafusion_query_cache_spark.sources.tables import with_ns_shadow

    # batch comparison through the same unit normalization as the stream
    batch = with_ns_shadow(
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet")), "ts"
    )
    expect = (
        batch.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    assert rows_set(got) == rows_set(expect)


def test_incremental_availablenow_processes_only_new_files(
    spark, events_dir, tmp_path
):
    """Run 1 drains the seed file; adding a second file and re-running with
    the same checkpoint processes ONLY the new file — the streaming twin of
    the batch cache's watermark refresh."""
    from datafusion_query_cache_spark.streaming.incremental import (
        parquet_stream,
        run_available_now,
        windowed_aggregate,
    )

    def build():
        stream = parquet_stream(spark, events_dir, ns_timestamp_columns=["ts"])
        return windowed_aggregate(
            stream,
            ts_col="ts",
            window_duration="1 hour",
            group_cols=[],
            agg_exprs={"n": F.count(F.lit(1))},
            watermark_delay="1 hour",
        )

    ckpt = str(tmp_path / "ckpt2")
    run_available_now(build(), "stream_inc", ckpt, "complete")
    n1 = spark.sql("SELECT sum(n) AS t FROM stream_inc").collect()[0]["t"]

    # "new data arrives": a second file appears in the watched directory
    shutil.copy(
        os.path.join(SF_DIR, "events.parquet"),
        os.path.join(events_dir, "events-1.parquet"),
    )
    run_available_now(build(), "stream_inc", ckpt, "complete")
    n2 = spark.sql("SELECT sum(n) AS t FROM stream_inc").collect()[0]["t"]
    assert n2 == 2 * n1  # second run folded in exactly the new file


def test_sessionize_stateful_operator(spark, events_dir, tmp_path):
    """applyInPandasWithState sessionization: plumbing + semantics smoke.

    With a 1-minute gap on sparse data, nearly every event closes the prior
    session once later events (or the final watermark) arrive."""
    from datafusion_query_cache_spark.streaming.incremental import parquet_stream
    from datafusion_query_cache_spark.streaming.sessionize import sessionize

    stream = parquet_stream(spark, events_dir, ns_timestamp_columns=["ts"])
    sess = sessionize(stream, gap_minutes=60, watermark_delay="1 minute")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql(
        "SELECT user_id, session_start, session_end, n_events, sum_value FROM sessions"
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_sessionize_batch_known_sessions(spark):
    """Hand-built fixture with known session structure: gaps > 60 min split;
    first event opens; exact ns arithmetic."""
    import pandas as pd

    from pyspark.sql import functions as F

    from datafusion_query_cache_spark.streaming.sessionize import sessionize_batch

    m = 60 * 1_000_000_000  # one minute in ns
    rows = [
        # user 1: two sessions (gap 61min between 2nd and 3rd event)
        (1, 0 * m, 1.0),
        (1, 30 * m, 2.0),
        (1, 91 * m, 4.0),
        # user 2: one session, single event
        (2, 10 * m, 8.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts_ns", "value"]),
        "user_id long, ts_ns long, value double",
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["start_ns"], r["end_ns"], r["n_events"], r["sum_value"]
        )
        for r in sessionize_batch(df, gap_minutes=60).collect()
    }
    assert got == {
        (1, 1): (0, 30 * m, 2, 3.0),
        (1, 2): (91 * m, 91 * m, 1, 4.0),
        (2, 1): (10 * m, 10 * m, 1, 8.0),
    }


def test_sessionize_batch_single_exchange(spark):
    """Both window passes and the flag-sum share one (user) partitioning —
    the plan must contain exactly one Exchange below the final aggregation."""
    from datafusion_query_cache_spark.streaming.sessionize import sessionize_batch

    ev = spark.table("events")
    plan = (
        sessionize_batch(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan[:2000]  # windows share one; final agg adds one

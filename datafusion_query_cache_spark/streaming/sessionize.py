"""Custom stateful streaming operator: gap-based sessionization.

The one operator class Spark's built-in streaming aggregates can't express
(sessions close on *inactivity*, not on a fixed window) — implemented with
``applyInPandasWithState`` (Arrow-batched, per-key state store), the
prescribed escape hatch for custom stateful semantics.

State per user: (open-session start, last event time, event count, value
sum). A session closes when a new event arrives more than ``gap`` after the
last one, or when the event-time timeout fires (watermark passed last+gap).
Closed sessions are appended downstream; the open session stays in state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start_us long, last_us long, n long, sv double"

_US = 1_000_000


def sessionize_batch(
    df: DataFrame,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
    value_col: str = "value",
    gap_minutes: int = 60,
    gap_ticks: Optional[int] = None,
) -> DataFrame:
    """Batch twin of the streaming sessionizer — identical gap semantics,
    expressed as the classic gaps-and-islands window program (fully
    SQL-expressible, so it is oracle-checkable, unlike the stateful
    streaming form):

    1. ``lag(ts)`` per user → a new-session flag when the gap exceeds
       ``gap_minutes`` (or at the first event),
    2. a running sum of the flag = the session index,
    3. group by (user, session) for start/end/count/sum.

    Operates on a raw epoch-integer column for exact arithmetic
    (``gap_ticks`` overrides ``gap_minutes`` when the column's unit is not
    nanoseconds — e.g. µs ticks for parity with engines that truncate ns
    timestamps). Plan: two
    window passes over ONE shuffle partitioning (both windows share
    PARTITION BY user ORDER BY ts, so Catalyst plans a single Exchange +
    Sort), then the final aggregation re-shuffles only (user, session)
    rows. Scales as a plain windowed aggregation."""
    from pyspark.sql import Window

    gap = gap_ticks if gap_ticks is not None else gap_minutes * 60 * 1_000_000_000
    w = Window.partitionBy(user_col).orderBy(F.col(ts_ns_col))
    prev = F.lag(F.col(ts_ns_col)).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_ns_col) - prev) > F.lit(gap)), 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = df.select(
        F.col(user_col),
        F.col(ts_ns_col),
        F.col(value_col),
        is_new.alias("__new"),
    ).select(
        user_col,
        ts_ns_col,
        value_col,
        F.sum("__new").over(wrun).alias("session_id"),
    )
    return flagged.groupBy(user_col, "session_id").agg(
        F.min(ts_ns_col).alias("start_ns"),
        F.max(ts_ns_col).alias("end_ns"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    )


def sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 60,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        closed = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, sv = state.get
                closed.append((user, start_us, last_us, n, sv))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for t, v in zip(pdf[ts_col], pdf[value_col]):
                    rows.append((int(t.value // 1000), float(v)))
            rows.sort()
            if state.exists:
                start_us, last_us, n, sv = state.get
            else:
                start_us, last_us, n, sv = None, None, 0, 0.0
            for t_us, v in rows:
                if last_us is not None and t_us - last_us > gap_us:
                    closed.append((user, start_us, last_us, n, sv))
                    start_us, last_us, n, sv = None, None, 0, 0.0
                if start_us is None:
                    start_us = t_us
                last_us = t_us
                n += 1
                sv += v
            if start_us is not None:
                state.update((start_us, last_us, n, sv))
                # close the open session when the watermark passes last+gap
                state.setTimeoutTimestamp((last_us + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] for c in closed],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

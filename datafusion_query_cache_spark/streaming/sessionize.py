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

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start_us long, last_us long, n long, sv double"

_US = 1_000_000


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

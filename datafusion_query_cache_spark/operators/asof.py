"""As-of (point-in-time) join — the time-series join Spark SQL lacks.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key — the canonical operator for
"state as of event time" enrichment (last price before a trade, last login
before an event, ...).

Implementation is the union-and-window technique, expressible entirely with
built-in operators:

1. tag and union both sides (right rows carry the payload, left rows NULLs);
2. one window pass per key ordered by (ts, right-first-on-ties) carries the
   last non-null payload forward (``last(..., ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)``);
3. keep the left rows.

Scale shape: exactly ONE shuffle (hash partition by key) + an in-partition
sort — the same cost as a sort-merge join, with no range-explosion. Skewed
keys behave like any skewed window (AQE helps; salt the key upstream if one
entity dominates).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    value_cols: Sequence[str],
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` row with ``ts <= left.ts`` per key.

    ``value_cols`` are the right-side payload columns to attach (must not
    collide with left's column names). Ties (equal ts) join inclusively —
    the right row at exactly ``left.ts`` matches, same as DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``. ``tolerance_seconds`` drops matches
    older than the window (pandas ``merge_asof(tolerance=...)`` semantics).
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {clash}")

    l = left
    for c in value_cols:
        dt = dict(right.dtypes)[c]
        l = l.withColumn(c, F.lit(None).cast(dt))
    l = l.withColumn("__src", F.lit(0)).withColumn(
        "__rts", F.lit(None).cast(dict(right.dtypes)[ts_col])
    )

    r = right.select(
        by,
        ts_col,
        *value_cols,
        F.lit(1).alias("__src"),
        F.col(ts_col).alias("__rts"),
    )
    for c in left.columns:
        if c not in (by, ts_col) and c not in value_cols:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = l.unionByName(r)
    # right rows sort BEFORE left rows at equal ts → inclusive as-of
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("__src").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in left.columns],
        F.col("__src"),
        *[
            F.last(F.when(F.col("__src") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__f_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("__src") == 1, F.col("__rts")), ignorenulls=True)
        .over(w)
        .alias("__f_rts"),
    )
    out = filled.filter(F.col("__src") == 0)
    keep = [F.col(c) for c in left.columns]
    vals = []
    for c in value_cols:
        v = F.col(f"__f_{c}")
        if tolerance_seconds is not None:
            in_window = (
                F.col(ts_col).cast("double") - F.col("__f_rts").cast("double")
            ) <= F.lit(float(tolerance_seconds))
            v = F.when(in_window, v)
        vals.append(v.alias(c))
    return out.select(*keep, *vals)

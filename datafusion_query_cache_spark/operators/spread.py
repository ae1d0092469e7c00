"""Scan-parallelism guard for small / unsplittable inputs.

A parquet file is splittable only at ROW-GROUP grain: a file written as one
row group is one scan task no matter how small ``maxPartitionBytes`` is or
how many cores the session has. The bench fixtures (and any compacted small
table) are exactly that shape — so every downstream per-row computation
(shingling, hashing, regex, higher-order array folds) serializes onto one
core out of 32. This is the "one huge unsplittable file" input-skew case of
the optimization guide (§2.5): the fix is one cheap round-robin repartition
of the raw rows immediately after the read, which unlocks full-width scan
stages for everything downstream.

At scale this is a NO-OP by construction: any input whose optimizer size
estimate exceeds the smallness threshold (default 256 MB, i.e. at most a
couple of scan splits) is returned unchanged, so a 100 TB table never pays
the extra exchange. The gate reads ``optimizedPlan().stats().sizeInBytes``
— driver-side metadata, no Spark job and (unlike a ``df.rdd`` partition
probe) no per-plan deserializer codegen, which measured 0.3-0.6 s per
fresh plan. Cost: one Catalyst analyze+optimize of the input lineage
(~10 ms for the scan/filter inputs the guarded operators receive; a
deeply derived input pays its own plan-optimization once more — pass
such frames through ``localCheckpoint`` first, as the components
pipeline does).
"""

from __future__ import annotations

import os
import threading as _threading
import weakref as _weakref
from contextlib import contextmanager

from pyspark.sql import DataFrame

#: set to "0" to disable everywhere (e.g. to A/B the effect)
_ENV_FLAG = "QC_SPREAD_SMALL_INPUTS"

#: inputs whose optimizer size estimate is at or below this are "small":
#: their scan runs on a handful of tasks at the default 128 MB split size,
#: so per-row-heavy work deserves a spread (and standing-ingest commits
#: deserve the AQE-off scope). Estimates propagate conservatively — a
#: filtered slice of a huge table keeps the table's size, which errs
#: toward NOT treating big-table derivatives as small.
_SMALL_BYTES = int(
    os.environ.get("QC_SPREAD_MAX_BYTES", str(256 << 20))
)


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (driver metadata, no job)."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def is_small_input(df: DataFrame) -> bool:
    """True when ``df`` is estimated at or under the smallness threshold
    (see module doc). False for streaming inputs, estimate failures, or
    when QC_SPREAD_SMALL_INPUTS=0."""
    if os.environ.get(_ENV_FLAG, "1").lower() in ("0", "false"):
        return False
    try:
        if df.sparkSession.sparkContext.defaultParallelism <= 1:
            return False
        return _plan_size_bytes(df) <= _SMALL_BYTES
    except Exception:
        return False


def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default parallelism
    when its scan would otherwise run on too few tasks (see module doc).

    Row-preserving and deterministic under retries (Spark's
    ``sortBeforeRepartition`` applies); per-row ORDER within a partition is
    the source order of that row's slice, and every operator this guards is
    either per-row or a grouped aggregation, so results are unchanged.
    Streaming inputs fall through untouched.
    """
    if not is_small_input(df):
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


#: per-parent-session AQE-off execution clones (see :func:`exec_session`).
#: WeakKeyDictionary — a GC'd parent drops its clone entry, so a reused
#: id() can never alias a dead session's clone (the id()-keyed hazard the
#: r17 advice flagged for the scope state below).
_CLONE_LOCK = _threading.Lock()
_EXEC_CLONES: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()

#: runtime confs re-pinned from the parent at clone creation.
#: ``newSession()`` already inherits every conf set at BUILDER time (the
#: engine session's whole configuration, ``sources.tables.get_session``);
#: this list covers runtime drift on the confs that bear on results or on
#: the small-commit plan shape.
_CLONE_PIN_CONFS = (
    "spark.sql.session.timeZone",
    "spark.sql.ansi.enabled",
    "spark.sql.caseSensitive",
    "spark.sql.shuffle.partitions",
    "spark.sql.join.preferSortMergeJoin",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.parquet.compression.codec",
)


def exec_session(spark):
    """The per-parent AQE-OFF execution session for small-delta commits
    and tiny-graph loops.

    Why a CLONE and not a runtime-conf flip: ``spark.conf`` is session-
    global, so the r17 ``aqe_off_scope`` silently disabled AQE (skew
    splitting, partition coalescing) for any UNRELATED query planned on
    the same session while an ingest commit was open — a real hazard on
    a shared 100 TB session with concurrent driver threads
    (``ConcurrentIndexWriter`` is a supported pattern). A
    ``spark.newSession()`` clone shares the SparkContext, cached data
    and external catalog but has its OWN SQLConf, so pinning
    ``spark.sql.adaptive.enabled=false`` there can never leak into the
    caller's plans. Small-delta programs are rebound onto the clone via
    :func:`on_session` (a logical-plan transfer — no data moves) and
    their actions run with AQE off; everything else about the parent
    session is untouched.

    Returns ``None`` when cloning is unavailable (callers fall back to
    :func:`aqe_off_scope` on the parent — the pre-r18 behavior).
    """
    try:
        with _CLONE_LOCK:
            clone = _EXEC_CLONES.get(spark)
            if clone is None:
                clone = spark.newSession()
                for k in _CLONE_PIN_CONFS:
                    try:
                        v = spark.conf.get(k, None)
                        if v is not None:
                            clone.conf.set(k, v)
                    except Exception:
                        pass
                clone.conf.set("spark.sql.adaptive.enabled", "false")
                _EXEC_CLONES[spark] = clone
        return clone
    except Exception:
        return None


def on_session(df: DataFrame, target) -> DataFrame:
    """Rebind ``df``'s logical plan onto ``target`` (a session of the
    SAME SparkContext, e.g. an :func:`exec_session` clone).

    A pure driver-side transfer: ``Dataset.ofRows(target, df.analyzed)``
    re-runs analysis on the ALREADY-RESOLVED tree under the target's
    SQLConf (idempotent) — no data moves, and persisted/cached children
    still hit the shared cache (the CacheManager lives in the shared
    state). The analyzed plan is used rather than the raw logical one
    because temp views are NOT shared across sessions: an unresolved
    view reference would fail to re-resolve on the clone, while the
    analyzed tree carries the resolved relations inline. Raises on
    failure so the caller can fall back wholesale to the parent
    session."""
    if target is None or df.sparkSession is target:
        return df
    sess = df.sparkSession
    jdf = sess._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        target._jsparkSession, df._jdf.queryExecution().analyzed()
    )
    return DataFrame(jdf, target)


#: reentrancy state for :func:`aqe_off_scope`, keyed by id(spark):
#: (depth, original value). Guarded by a lock so overlapping scopes on
#: one session (e.g. driver threads running concurrent ingests) restore
#: the ORIGINAL conf exactly once, at depth zero — naive save/restore
#: could otherwise re-save "false" mid-overlap and leave AQE off forever.
_AQE_LOCK = _threading.Lock()
_AQE_STATE: dict = {}


@contextmanager
def aqe_off_scope(spark, off: bool):
    """Scope ``spark.sql.adaptive.enabled=false`` when ``off`` — the
    caller has already decided smallness (see :func:`is_small_input`).

    Why: AQE materializes every exchange as its own Spark stage-job. For a
    standing-index ingest whose delta is small BY DESIGN, those stage jobs
    are pure scheduler overhead — measured ~0.15s each on jobs that carry a
    few hundred rows, several per commit. With AQE off the same program
    runs as ONE job per action (fixed ``spark.sql.shuffle.partitions``
    reducers, fine for a small delta). Big deltas keep AQE — and its
    skew/coalescing value — untouched. The conf is restored on exit
    (reentrancy-safe across overlapping scopes; note that UNRELATED
    queries submitted to the same session while a scope is open do plan
    without AQE — the session conf is global, the standard caveat of any
    runtime conf).
    """
    key = "spark.sql.adaptive.enabled"
    entered = False
    if off:
        try:
            with _AQE_LOCK:
                depth, was = _AQE_STATE.get(id(spark), (0, None))
                if depth == 0:
                    was = spark.conf.get(key, "true")
                    spark.conf.set(key, "false")
                _AQE_STATE[id(spark)] = (depth + 1, was)
            entered = True
        except Exception:
            entered = False
    try:
        yield
    finally:
        if entered:
            with _AQE_LOCK:
                depth, was = _AQE_STATE[id(spark)]
                if depth <= 1:
                    del _AQE_STATE[id(spark)]
                    spark.conf.set(key, was)
                else:
                    _AQE_STATE[id(spark)] = (depth - 1, was)

"""``CachedSparkSession`` — the engine's single user entry point.

Drop-in analogue of the reference's session wiring
(``with_query_cache``/``with_query_cache_log``, ``src/lib.rs:74-87``) plus
the whole rewrite/planning pipeline that the reference spreads across its
optimizer rule (``src/aggregate.rs:40-213``) and physical planner hook
(``src/aggregate.rs:319-411``), re-expressed as DataFrame program
construction:

* ``sql(q)`` parses ``q`` into the mini-IR; any shape or feature outside the
  cacheable surface runs as plain ``spark.sql(q)`` (the reference's
  ``Transformed::no`` passthrough, ``src/aggregate.rs:85-88``).
* Cacheable aggregates are decomposed into partial state (SURVEY §4.3);
  cache **miss** stores freshly computed state, **hit** unions cached state
  with a lower-bounded fresh scan (``ts >= watermark``) and merges —
  the reference's ``Union[Cached, LowerBounded(partial)] → Final`` plan
  (``src/aggregate.rs:386-409``) as ``unionByName → groupBy().agg(merge)``.

Scale notes (local[32] is the test rig; the design targets a cluster):
* the fresh-scan filter ``pred AND ts >= wm`` sits *below* the aggregation,
  so Catalyst pushes it into the Parquet scan → row-group / partition
  pruning on the temporal column does the heavy lifting;
* the union+merge agg shuffles only the state rows (one per group), not the
  input data — the input-side aggregation is Spark's normal partial/final
  hash aggregate with map-side combine;
* no Python UDFs anywhere on this path: every expression compiles to
  built-in Columns inside whole-stage codegen.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .cache import CacheEntry, StateCardinalityExceeded
from .config import QueryCacheConfig
from .functions.compile import to_column
from .functions.partial import ItemPlan, NotDecomposable, plan_items
from .plans.classify import (
    Verdict,
    classify,
    find_temporal_group_by,
    split_dynamic_bound,
)
from .plans.ir import AggSpec, Col, Lit, Unsupported
from .plans.parser import parse_agg_query


def _push_time_bounds(
    df: DataFrame,
    ts_col: str,
    shadow: str,
    lo_ns: Optional[int] = None,
    hi_ns: Optional[int] = None,
) -> DataFrame:
    """Exact ``[lo, hi)`` bounds on the temporal axis, shaped for pushdown.

    Exactness comes from the epoch-ns shadow when present. Pushdown comes
    from a REDUNDANT superset bound on the timestamp column itself: for
    µs/NTZ sources the shadow is a derived column (``unix_micros(ts)*1000``,
    ``sources/tables.py``), so ``shadow >= lit`` is an expression filter the
    parquet scan can't use — while ``ts >= timestamp_micros(lit)`` survives
    Spark's cast-unwrapping into ``PushedFilters`` (row-group pruning; the
    100 TB warm refresh reads only the fresh tail). Floor the lower / ceil
    the upper µs bound so it never excludes a row the ns bound admits; the
    conjunction is therefore exactly the ns range. Without a shadow the µs
    bound ceils BOTH ends so consecutive runs tile exactly.

    Reference converts Arrow time units at the same boundary
    (``src/aggregate.rs:431-439``).
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    types = {f.name: f.dataType for f in df.schema.fields}
    has_shadow = shadow in types
    ts_is_time = isinstance(
        types.get(ts_col), (TimestampType, TimestampNTZType)
    )
    if lo_ns is not None:
        if has_shadow:
            df = df.filter(F.col(shadow) >= F.lit(lo_ns))
            if ts_is_time:
                df = df.filter(
                    F.col(ts_col) >= F.timestamp_micros(F.lit(lo_ns // 1000))
                )
        else:
            df = df.filter(
                F.col(ts_col) >= F.timestamp_micros(F.lit(-(-lo_ns // 1000)))
            )
    if hi_ns is not None:
        hi_us = -(-hi_ns // 1000)
        if has_shadow:
            df = df.filter(F.col(shadow) < F.lit(hi_ns))
            if ts_is_time:
                df = df.filter(F.col(ts_col) < F.timestamp_micros(F.lit(hi_us)))
        else:
            df = df.filter(F.col(ts_col) < F.timestamp_micros(F.lit(hi_us)))
    return df


def _order_col(name: str, o) -> Column:
    """ORDER BY item → Column with explicit direction AND null order.

    NULLS FIRST/LAST must be honored: for maintained top-k state the sort
    decides which rows are RETAINED, so dropping the null order keeps wrong
    rows, not just displays them in a different order."""
    c = F.col(name)
    if o.nulls_first is None:
        return c.desc() if o.desc else c.asc()
    if o.desc:
        return c.desc_nulls_first() if o.nulls_first else c.desc_nulls_last()
    return c.asc_nulls_first() if o.nulls_first else c.asc_nulls_last()


@dataclass
class Decision:
    """What the planner did for one ``sql()`` call — the observability story
    (reference: decision log ``src/log.rs`` + ``EXPLAIN ANALYZE`` demo)."""

    sql: str
    cached: bool
    reason: str = ""
    fingerprint: Optional[str] = None
    cache_hit: bool = False
    watermark_ns: Optional[int] = None
    now_ns: Optional[int] = None
    #: the dynamic lower bound this run used — DUAL FORM: the EVALUATED
    #: f(now()) value (timestamp/date) on the classic path, or the
    #: rendered pinned-now SQL expression (string) on the fused template
    #: path, which never evaluates the bound driver-side (that would cost
    #: a Spark job per refresh). Non-None ⇔ a dynamic bound was in play.
    dynamic_lower: Optional[object] = None
    observation: Optional[Observation] = None  # fresh-scan row count (hit only)
    #: which warm-refresh tier served a dynamic-bound hit: "nano" (driver
    #: pyarrow scan), "lite" (one plain-sized job + driver merge),
    #: "template" (fused one-job SQL), or "classic" (DataFrame assembly)
    refresh_tier: Optional[str] = None
    #: exact fresh-row count when the SQL-template warm path ran (it counts
    #: via a rider aggregate instead of an Observation)
    fresh_rows_value: Optional[int] = None
    #: fingerprint of the WEAKER filter entry a miss was served from
    #: (semantic-cache subsumption), when that happened
    semantic_donor: Optional[str] = None
    #: True when a hot read was answered from the session's result memo
    #: (zero Spark work — not even a local finalize job)
    served_from_memo: bool = False

    def fresh_rows(self) -> Optional[int]:
        """Rows scanned by the incremental refresh (the reference's
        ``EXPLAIN ANALYZE`` row-count oracle, ``examples/demo.rs:52-63``).
        None when unavailable."""
        if self.fresh_rows_value is not None:
            return self.fresh_rows_value
        if self.observation is None:
            return None
        try:
            return self.observation.get.get("rows")
        except Exception:
            return None


class CachedSparkSession:
    """Wraps a ``SparkSession`` with the incremental aggregate cache."""

    def __init__(self, spark: SparkSession, config: Optional[QueryCacheConfig] = None):
        self.spark = spark
        self.config = config or QueryCacheConfig()
        self.last_decision: Optional[Decision] = None
        self._obs_counter = 0
        # (query, source-schema) → compiled ItemPlans. A standing query
        # re-runs with identical text against the same schema every few
        # seconds; re-deriving the decompositions costs ~70 ms of py4j
        # Column building per call, all of it identical. Keyed on schema so
        # a source change invalidates naturally.
        self._plan_cache: Dict[tuple, list] = {}
        #: (query, schema) → compiled group/predicate Column handles
        self._col_cache: Dict[tuple, tuple] = {}
        self._spec_cache: Dict[str, object] = {}
        # (query, source schema, state schema) → warm-path SQL template (or
        # None = shape not template-able). The template collapses the whole
        # refresh program — fresh scan, singleton projection, union with the
        # state view, merge, finalize — into ONE SQL string with watermark
        # placeholders, so a standing query pays a single JVM parse instead
        # of ~600 py4j round-trips of DataFrame program rebuilding.
        self._tpl_cache: Dict[tuple, Optional[dict]] = {}
        # re-entrant scope state for _refresh_confs (see its docstring)
        import threading as _threading

        self._conf_lock = _threading.Lock()
        self._conf_depth = 0
        self._conf_saved: Dict[str, str] = {}
        #: debug/observability: the refresh program of the last cached run
        #: (the augmented state+finalize DataFrame), for plan inspection
        self.last_refresh_df: Optional[DataFrame] = None
        #: fingerprint → (FilterSpec, out column names) for every filter
        #: entry this session stored — the donor index for semantic
        #: subsumption (serve `value > 2` from the `value > 1` row set)
        self._filter_registry: Dict[str, tuple] = {}
        #: aggregate fingerprints already tagged for the durable
        #: bucket-coarsening donor index
        self._agg_registry: set = set()
        #: (fingerprint, watermark_ns) → finalized result DataFrame. See
        #: QueryCacheConfig.result_memo; bounded LRU.
        self._result_memo: "OrderedDict[tuple, DataFrame]" = OrderedDict()
        #: fingerprints whose percentile histogram state exceeded
        #: config.percentile_max_distinct — permanently passthrough this
        #: session (the store bailed once; re-trying would redo the work
        #: just to bail again).
        self._hist_denied: set = set()

    _RESULT_MEMO_MAX = 128

    def _memo_result(self, fingerprint: str, wm_ns: Optional[int], df: DataFrame):
        if not self.config.result_memo or wm_ns is None:
            return
        memo = self._result_memo
        memo[(fingerprint, wm_ns)] = df
        memo.move_to_end((fingerprint, wm_ns))
        while len(memo) > self._RESULT_MEMO_MAX:
            memo.popitem(last=False)

    # -- public API ---------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Run ``query``; transparently incremental when cache-eligible."""
        try:
            from .plans.ir import FilterSpec
            from .plans.parser import parse_query

            spec = self._spec_cache.get(query)
            if spec is None:
                spec = parse_query(query)
                self._spec_cache[query] = spec
            if isinstance(spec, FilterSpec):
                df, decision = self._plan_filter(spec, query)
            else:
                df, decision = self._plan_cached(query, spec)
        except (Unsupported, NotDecomposable) as e:
            decision = Decision(sql=query, cached=False, reason=str(e))
            self.config.log.info("-", f"not cacheable: {e}")
            df = self.spark.sql(query)
        except StateCardinalityExceeded as e:
            # percentile-histogram or count(DISTINCT) set state would be
            # O(distinct)/group past the configured bound: mark the
            # fingerprint and degrade to passthrough — correct results, no
            # runaway state.
            self._hist_denied.add(e.fingerprint)
            decision = Decision(sql=query, cached=False, reason=str(e))
            self.config.log.warn(e.fingerprint, str(e))
            df = self.spark.sql(query)
        self.last_decision = decision
        return df

    # -- planning -----------------------------------------------------------

    def _now_ns(self) -> int:
        # reference: override_now or query_execution_start_time
        # (``src/aggregate.rs:375-382``) — captured once per query, plan time.
        if self.config.override_now_ns is not None:
            return self.config.override_now_ns
        return time.time_ns()

    def _pin_now(self, rhs_expr, now_ns: int):
        """Rewrite every now()/current_date() node in ``rhs_expr`` to the
        pinned plan-time instant (mirrors the reference's
        query_execution_start_time capture, ``src/aggregate.rs:375-382``)."""
        from .plans.ir import BinOp as _BinOp, Cast as _Cast, Func as _Func
        from .plans.ir import Lit as _Lit, Neg as _Neg

        # Epoch-based now literal (timestamp_micros), NOT a wall-clock
        # string: a string literal is re-interpreted in the session timezone,
        # shifting the bound by the UTC offset on non-UTC sessions relative
        # to passthrough now().
        now_node = _Func("make_timestamp", (_Lit(now_ns // 1000, "BIGINT"),))

        def rec(x):
            if isinstance(x, _Func):
                nl = x.name.lower()
                if nl in (
                    "now",
                    "current_timestamp",
                    "localtimestamp",
                    "get_current_timestamp",
                    "transaction_timestamp",
                ):
                    return now_node
                if nl in ("current_date", "today"):
                    # date-in-session-tz of the pinned now — matches what
                    # passthrough current_date() evaluates to.
                    return _Cast(now_node, "DATE")
                return _Func(x.name, tuple(rec(a) for a in x.args))
            if isinstance(x, _BinOp):
                return _BinOp(x.op, rec(x.left), rec(x.right))
            if isinstance(x, _Cast):
                return _Cast(rec(x.child), x.to_type)
            if isinstance(x, _Neg):
                return _Neg(rec(x.child))
            return x

        return rec(rhs_expr)

    def _eval_bound_value(self, rhs_expr, now_ns: int):
        """Evaluate ``f(now())`` once at plan time with now pinned.
        Returns a python datetime/date."""
        col = to_column(self._pin_now(rhs_expr, now_ns))
        v = self.spark.range(1).select(col.alias("v")).collect()[0]["v"]
        if v is None:
            raise Unsupported("dynamic bound evaluated to NULL")
        return v

    def _eval_bucket(self, granularity: str, lower):
        """date_trunc the evaluated bound — via Spark so week/month/calendar
        semantics match the engine exactly."""
        return (
            self.spark.range(1)
            .select(F.date_trunc(granularity, F.lit(lower)).alias("b"))
            .collect()[0]["b"]
        )

    _BUCKET_INTERVAL = {
        "minute": "INTERVAL '1' MINUTE",
        "hour": "INTERVAL '1' HOUR",
        "day": "INTERVAL '1' DAY",
        "dd": "INTERVAL '1' DAY",
        "week": "INTERVAL '7' DAY",
        "month": "INTERVAL '1' MONTH",
        "mon": "INTERVAL '1' MONTH",
        "mm": "INTERVAL '1' MONTH",
        "quarter": "INTERVAL '3' MONTH",
        "year": "INTERVAL '1' YEAR",
        "yyyy": "INTERVAL '1' YEAR",
        "yy": "INTERVAL '1' YEAR",
    }

    def _eval_bound_and_bucket(self, rhs_expr, now_ns: int, granularity: str):
        """Bound value, its bucket truncation, their epoch-µs forms, and the
        epoch-µs end of the boundary bucket — ONE driver-local job (the
        dynamic warm path runs per refresh, so the tiny range(1) collects
        are folded together). The epochs are computed JVM-side via
        ``unix_micros`` in the SESSION timezone; the CLASSIC dyn assembly
        binds them as its boundary-scan range (no Python-side timezone
        assumption, no DST slack — the bucket end is ``date_trunc +
        INTERVAL``, calendar-exact in any tz). The fused SQL template
        never calls this: it renders the bound as a constant-folded
        expression instead. Returns
        ``(value, bucket, value_us, bucket_us, bucket_end_us | None)``."""
        col = to_column(self._pin_now(rhs_expr, now_ns))
        b = F.date_trunc(granularity, col)
        iv = self._BUCKET_INTERVAL.get(granularity.lower())
        cols = [
            col.alias("v"),
            b.alias("b"),
            F.unix_micros(col.cast("timestamp")).alias("v_us"),
            F.unix_micros(b.cast("timestamp")).alias("b_us"),
        ]
        if iv is not None:
            cols.append(
                F.unix_micros((b + F.expr(iv)).cast("timestamp")).alias("be_us")
            )
        row = self.spark.range(1).select(*cols).collect()[0]
        if row["v"] is None:
            raise Unsupported("dynamic bound evaluated to NULL")
        be_us = row["be_us"] if iv is not None else None
        return row["v"], row["b"], row["v_us"], row["b_us"], be_us

    def _plan_filter(self, spec, query: str):
        """Simple filter (non-aggregate) query caching — the reference's
        second unchecked roadmap box (``README.md:130``).

        State is the filtered/projected ROW SET itself (bag-union monoid):
        refresh appends only rows in ``[watermark, now)`` — O(new data), the
        same exact window tiling as the aggregate path. With ORDER BY +
        LIMIT the state is instead the maintained top-k (top-k of
        ``topk(old) ∪ fresh`` ≡ top-k of the whole history), so the stored
        state stays k rows no matter how much data flows through.
        """
        cfg = self.config

        cls = classify(spec.predicate, cfg.temporal_columns)
        if cls.verdict is not Verdict.STABLE:
            raise Unsupported(
                f"filter predicate not stable: {cls.reason or cls.verdict.value}"
            )
        for item in spec.items or ():
            if classify(item.expr, cfg.temporal_columns).verdict is not Verdict.STABLE:
                raise Unsupported(f"non-deterministic select item {item.name}")
        if spec.limit is not None and not spec.order_by:
            raise Unsupported("LIMIT without ORDER BY selects arbitrary rows")

        ts_col = cfg.default_temporal_column
        base = self.spark.table(spec.table)
        if ts_col not in base.columns:
            raise Unsupported(f"temporal column {ts_col} not in table {spec.table}")

        out_names = (
            list(base.columns)
            if spec.items is None
            else [i.name for i in spec.items]
        )

        def project(df: DataFrame) -> DataFrame:
            if spec.items is None:
                return df
            return df.select(*[to_column(i.expr).alias(i.name) for i in spec.items])

        def sort_items():
            items = []
            for o in spec.order_by:
                if isinstance(o.expr, Col) and o.expr.name in out_names:
                    name = o.expr.name
                elif isinstance(o.expr, Lit) and isinstance(o.expr.value, int):
                    idx = o.expr.value - 1
                    if not 0 <= idx < len(out_names):
                        raise Unsupported("order-by position out of range")
                    name = out_names[idx]
                else:
                    for i in spec.items or ():
                        if i.expr == o.expr:
                            name = i.name
                            break
                    else:
                        raise Unsupported("order by expression not in select list")
                items.append((name, o))
            return items

        def sort_cols():
            return [_order_col(n, o) for n, o in sort_items()]

        topk = spec.limit is not None
        fingerprint = (
            f"{spec.canon()}|ts={ts_col}|schema={base.schema.simpleString()}"
        )
        now_ns = self._now_ns()
        entry = cfg.cache.entry(fingerprint)
        pred = to_column(spec.predicate) if spec.predicate is not None else None
        shadow = f"{ts_col}_ns"

        # Non-top-k row-set state IS the result set — it grows with the data
        # (unlike aggregate state). Two guards (VERDICT r2 item 6):
        # 1. size cap: past config.filter_state_max_rows the query stops
        #    being cached (passthrough) instead of growing state silently;
        # 2. layout: state is stored hive-partitioned by the temporal DATE
        #    (hidden `__qc_d` column) so temporally-bounded reads of the
        #    state — semantic-donor replays, downstream consumers — prune
        #    whole directories.
        part_col = "__qc_d"
        if not topk and cfg.filter_state_max_rows is not None:
            known_rows = entry.state_rows()
            if known_rows is not None and known_rows > cfg.filter_state_max_rows:
                raise Unsupported(
                    f"filter row-set state ({known_rows} rows) exceeds "
                    f"filter_state_max_rows={cfg.filter_state_max_rows}"
                )

        def project_store(df: DataFrame) -> DataFrame:
            """Projection for the STORED row set: user columns + the hidden
            date partition column (derived pre-projection, so it exists even
            when the query doesn't select the temporal column)."""
            if topk:
                return project(df)
            d = F.to_date(F.col(ts_col)).alias(part_col)
            if spec.items is None:
                return df.withColumn(part_col, F.to_date(F.col(ts_col)))
            return df.select(
                *[to_column(i.expr).alias(i.name) for i in spec.items], d
            )

        def bounds(df, lo_ns=None, hi_ns=None):
            return _push_time_bounds(df, ts_col, shadow, lo_ns, hi_ns)

        decision = Decision(
            sql=query, cached=True, fingerprint=fingerprint, now_ns=now_ns
        )

        hit = entry.occupied
        # stale: the entry holds state that failed validation — every
        # recompute store below must REPLACE it, or append would return
        # stale-state ∪ recompute (duplicated rows)
        stale = False
        expected = out_names if topk else out_names + [part_col]
        state: Optional[DataFrame] = None
        if hit:
            try:
                # metadata-only column check when the backend supports it;
                # the state DataFrame itself is built lazily (the driver
                # top-k tier never needs it)
                cols = entry.state_columns()
                if cols is None:
                    state = entry.get(self.spark)
                    cols = list(state.columns)
                if list(cols) != expected and set(cols) != set(expected):
                    cfg.log.warn(fingerprint, "filter state schema mismatch; recompute")
                    hit = False
                    stale = True
            except Exception as e:
                cfg.log.warn(fingerprint, f"filter state unreadable ({e}); recompute")
                hit = False
                stale = True

        src = base if pred is None else base.filter(pred)

        def store_wm(lo_ns: Optional[int]) -> int:
            """Watermark to store (config.watermark_mode): query time, or
            max(ts)+1 over this refresh's (pruned) window for late-data
            safety — the filter-path twin of the aggregate path's rule.

            MUST be computed BEFORE the store scan, which is then bounded
            by ``hi_ns=swm``: the max job and the store job are separate
            Spark jobs, so a row landing between them with event time above
            the collected max would otherwise be folded into the stored
            rows while the watermark stays below it — re-appended (duplicate)
            on the next refresh (ADVICE r3, medium)."""
            if cfg.watermark_mode != "data":
                return now_ns
            mdf = bounds(src, lo_ns=lo_ns, hi_ns=now_ns)
            if shadow in base.columns:
                mxc = F.max(F.col(shadow))
            else:
                mxc = F.max(
                    F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000)
                )
            mx = mdf.agg(mxc.alias("mx")).collect()[0]["mx"]
            if mx is not None:
                return int(mx) + 1
            return lo_ns if lo_ns is not None else 0

        def topk_nano_stored(wm_ns: int, swm: int):
            """Driver tier for the maintained top-k (zero Spark jobs):
            ``topk(state ∪ fresh)`` over ≤k state rows and a byte-gated
            fresh tail is a pyarrow scan + sort (``nano.NanoTopKProgram``)
            — the two small Spark jobs the distributed path pays per
            refresh cost more than the scan at this size. Returns the
            stored-state LocalRelation, or None → Spark path."""
            from .nano import build_nano_topk_program

            if not self._nano_tz_ok(fingerprint):
                return None
            key = ("topknano", fingerprint)
            if key not in self._tpl_cache:
                prog = None
                try:
                    if spec.items is None:
                        projection = [(c, c) for c in base.columns]
                    else:
                        projection = []
                        for i in spec.items:
                            if not isinstance(i.expr, Col):
                                raise Unsupported("non-column select item")
                            projection.append((i.name, i.expr.name))
                    sspec = [
                        (
                            n,
                            not o.desc,
                            o.nulls_first
                            if o.nulls_first is not None
                            else not o.desc,
                        )
                        for n, o in sort_items()
                    ]
                    prog = build_nano_topk_program(
                        spec.table, ts_col, projection, spec.predicate,
                        sspec, spec.limit, cfg.nano_refresh_max_bytes,
                    )
                except Exception as e:
                    cfg.log.info(
                        fingerprint, f"top-k nano tier not available ({e})"
                    )
                self._tpl_cache[key] = prog
            prog = self._tpl_cache[key]
            if prog is None:
                return None
            try:
                prog.validate(spec.table)
                state_tbl = entry.get_arrow()
                st_schema = entry.state_schema()
                if state_tbl is None or st_schema is None:
                    return None
                res = prog.refresh(state_tbl, wm_ns, swm)
                if not entry.put_arrow(swm, res, st_schema):
                    return None
                # rows are already in exact final order and limited: re-enter
                # Spark as a LocalRelation with NO re-sort (same pattern as
                # _arrow_result's sorted_locally path — a LocalRelation
                # orderBy would pay a per-refresh sort job)
                return self.spark.createDataFrame(res, schema=st_schema)
            except Exception as e:
                # source drift / unmirrorable data (NaN in a sort column):
                # drop the memo so the next refresh re-admits or re-degrades
                self._tpl_cache.pop(key, None)
                cfg.log.info(fingerprint, f"top-k nano refresh degraded ({e})")
                return None

        if hit:
            wm_ns = entry.watermark_ns
            swm = store_wm(wm_ns)
            stored = topk_nano_stored(wm_ns, swm) if topk else None
            if stored is not None:
                decision.refresh_tier = "nano"
            else:
                fresh = project_store(bounds(src, lo_ns=wm_ns, hi_ns=swm))
                if topk:
                    if state is None:
                        state = entry.get(self.spark)
                    merged = (
                        state.unionByName(fresh)
                        .orderBy(*sort_cols())
                        .limit(spec.limit)
                    )
                    stored = entry.put(swm, merged, self.spark)
                else:
                    stored = entry.append(
                        swm, fresh, self.spark, partition_cols=[part_col]
                    )
            decision.cache_hit = True
            decision.watermark_ns = wm_ns
            cfg.log.info(
                fingerprint, f"filter cache hit: appended rows since {wm_ns}"
            )
        else:
            stored = None
            donor = self._find_filter_donor(spec, now_ns, fingerprint)
            if donor is not None:
                # SEMANTIC HIT: a stored row set with a provably-WEAKER
                # predicate contains every row this query needs (S ⇒ W,
                # classic semantic caching). Filter the donor's rows with
                # THIS query's predicate and scan only [donor_wm, now) —
                # O(new data) instead of a full history scan, even though
                # this exact query has never run before.
                d_entry, d_wm, d_fp = donor
                try:
                    d_state = d_entry.get(self.spark)
                    if topk:
                        start0 = d_state.select(*out_names)
                    elif part_col in d_state.columns:
                        start0 = d_state.select(*out_names, part_col)
                    elif ts_col in out_names:
                        start0 = d_state.select(*out_names).withColumn(
                            part_col, F.to_date(F.col(ts_col))
                        )
                    else:
                        raise RuntimeError(
                            "donor state lacks the date partition column"
                        )
                    start = start0.filter(pred) if pred is not None else start0
                    swm = store_wm(d_wm)
                    fresh = project_store(bounds(src, lo_ns=d_wm, hi_ns=swm))
                    rows = start.unionByName(fresh)
                    if topk:
                        rows = rows.orderBy(*sort_cols()).limit(spec.limit)
                        stored = entry.put(swm, rows, self.spark)
                    else:
                        stored = entry.append(
                            swm,
                            rows,
                            self.spark,
                            partition_cols=[part_col],
                            replace=stale,
                        )
                    decision.cache_hit = True
                    decision.semantic_donor = d_fp
                    decision.watermark_ns = d_wm
                    cfg.log.info(
                        fingerprint,
                        f"filter semantic hit: predicate subsumed by {d_fp}; "
                        f"scanned only rows since {d_wm}",
                    )
                except Exception as e:
                    cfg.log.warn(
                        fingerprint, f"semantic donor unusable ({e}); full miss"
                    )
                    stored = None
            if stored is None:
                swm = store_wm(None)
                rows = project_store(bounds(src, hi_ns=swm))
                if topk:
                    rows = rows.orderBy(*sort_cols()).limit(spec.limit)
                    stored = entry.put(swm, rows, self.spark)
                else:
                    stored = entry.append(
                        swm,
                        rows,
                        self.spark,
                        partition_cols=[part_col],
                        replace=stale,
                    )
                cfg.log.info(fingerprint, "filter cache miss: materializing rows")

        if fingerprint not in self._filter_registry:
            self._filter_registry[fingerprint] = (spec, tuple(out_names))
            try:
                # durable donor index: a DIFFERENT session sharing this
                # cache can subsume from entries it never created
                import json as _json

                from .plans.ir import ir_to_json

                cfg.cache.put_tag(
                    fingerprint, "filter_spec", _json.dumps(ir_to_json(spec))
                )
            except Exception:
                pass  # advisory only; never fail the query over a tag
        if topk and decision.refresh_tier == "nano":
            # driver tier returned a LocalRelation already in final order
            # and limited — a re-sort would cost a per-refresh sort job
            return stored, decision
        out = stored if topk else stored.drop(part_col)
        if spec.order_by:
            out = out.orderBy(*sort_cols())
        if spec.limit is not None:
            out = out.limit(spec.limit)
        return out, decision

    def _find_filter_donor(self, spec, now_ns: int, own_fp: str):
        """A previously-stored filter entry whose predicate is implied by
        ``spec``'s (S ⇒ W), same table/projection, full row set (no top-k),
        watermark ≤ now. Returns (entry, watermark_ns, fingerprint)."""
        from .plans.classify import predicate_implies
        from .plans.ir import Col as _ColRef

        # merge durable donors (other sessions on a shared cache) into the
        # session-local index
        try:
            import json as _json

            from .plans.ir import ir_from_json

            for fp, blob in self.config.cache.tags("filter_spec").items():
                if fp not in self._filter_registry:
                    dspec = ir_from_json(_json.loads(blob))
                    self._filter_registry[fp] = (dspec, ())
        except Exception:
            pass
        if not self._filter_registry:
            return None
        # this query's predicate must survive the projection: every column
        # it references must be selected as a bare identity item
        pred_cols = {
            n.name
            for n in (spec.predicate.walk() if spec.predicate is not None else ())
            if isinstance(n, _ColRef)
        }
        if spec.items is not None:
            identity = {
                i.name
                for i in spec.items
                if isinstance(i.expr, _ColRef) and i.expr.name == i.name
            }
            if not pred_cols <= identity:
                return None

        def items_canon(s):
            if s.items is None:
                return "*"
            return ";".join(f"{i.name}={i.expr.canon()}" for i in s.items)

        want = items_canon(spec)
        for fp, (dspec, _outs) in self._filter_registry.items():
            if fp == own_fp or dspec.table != spec.table:
                continue
            if dspec.limit is not None:  # top-k state is not a row superset
                continue
            if items_canon(dspec) != want:
                continue
            if not predicate_implies(spec.predicate, dspec.predicate):
                continue
            d_entry = self.config.cache.entry(fp)
            if not d_entry.occupied:
                continue
            d_wm = d_entry.watermark_ns
            if d_wm is None or d_wm > now_ns:
                continue
            return d_entry, d_wm, fp
        return None

    def _plan_cached(self, query: str, spec: Optional[AggSpec] = None):
        cfg = self.config
        if spec is None:
            spec = parse_agg_query(query)

        if spec.having is not None:
            # HAVING sits above the aggregate, so it never affects cached
            # state: plan it as a hidden select item and filter at finalize.
            # Only volatile scalars make it uncacheable.
            from .plans.classify import VOLATILE_FNS, VOLATILE_TIME_FNS
            from .plans.ir import Func as _Func

            for n in spec.having.walk():
                if isinstance(n, _Func) and n.name.lower() in (
                    VOLATILE_FNS | VOLATILE_TIME_FNS
                ):
                    raise Unsupported("volatile function in HAVING")

        if spec.grouping_fn_items and not spec.grouping_sets:
            raise Unsupported("grouping() without grouping sets")

        cls = classify(spec.predicate, cfg.temporal_columns)
        if cls.verdict is Verdict.ABANDON:
            raise Unsupported(f"predicate not stable: {cls.reason}")
        dyn_bound = None
        state_pred_expr = spec.predicate
        if cls.verdict is Verdict.FOUND:
            # Dynamic lower bound (`ts > now() - Δ`): beyond-reference — the
            # reference detects these and hard-errors
            # (``src/aggregate.rs:191-193``, README.md:131-132 unchecked).
            # Strategy: cache BOUND-INDEPENDENT state at bucket granularity
            # (so every Δ shares one entry); at read time take full buckets
            # above the boundary from state and recompute only the boundary
            # bucket exactly from raw rows (a pushed-down, one-bucket scan).
            split = split_dynamic_bound(spec.predicate, cfg.temporal_columns)
            if split is None:
                raise Unsupported("dynamic bound not in a plain AND conjunction")
            state_pred_expr, dyn_bound = split
        elif cls.verdict is Verdict.FOUND_NOW:
            raise Unsupported("now() outside a lower-bound comparison")

        tgb, ok = find_temporal_group_by(
            spec.group_by, cfg.temporal_columns, cfg.group_by_functions
        )
        if not ok:
            raise Unsupported("more than one temporal group-by bucket")

        ts_col = tgb.column if tgb else cfg.default_temporal_column
        if dyn_bound is not None and tgb is not None and tgb.column != dyn_bound.column:
            raise Unsupported("dynamic bound on a different column than the bucket")
        if dyn_bound is not None:
            ts_col = dyn_bound.column

        # first(x)/last(x) — time-series semantics (TimescaleDB first/last,
        # DataFusion first_value ordered): value at the minimum/maximum
        # temporal timestamp. Rewritten onto the existing argmin/argmax
        # state (min_by/max_by) so they merge exactly across refreshes;
        # the two-arg form first(x, k) takes an explicit ordering key.
        # (Bare Spark first() is ORDER-ARBITRARY and would be both
        # nondeterministic and non-mergeable — this definition is the one
        # dashboards actually want.)
        def _fl(e):
            from .plans.ir import AggCall as _A, Col as _C

            if (
                isinstance(e, _A)
                and e.fn.lower() in ("first", "last")
                and not e.distinct
                and 1 <= len(e.args) <= 2
            ):
                fn2 = "min_by" if e.fn.lower() == "first" else "max_by"
                order = e.args[1] if len(e.args) == 2 else _C(ts_col)
                return _A(fn2, (e.args[0], order))
            return e

        from .plans.ir import AggCall as _AggCall, transform as _transform

        def _has_fl(ex) -> bool:
            return any(
                isinstance(n, _AggCall) and n.fn.lower() in ("first", "last")
                for n in ex.walk()
            )

        if any(_has_fl(it.expr) for it in spec.aggregates) or (
            spec.having is not None and _has_fl(spec.having)
        ):
            import dataclasses as _dc

            from .plans.ir import SelectItem as _SI

            spec = _dc.replace(
                spec,
                aggregates=tuple(
                    _SI(it.name, _transform(it.expr, _fl)) for it in spec.aggregates
                ),
                having=(
                    _transform(spec.having, _fl) if spec.having is not None else None
                ),
            )

        # source: one table, or a left-deep star join (fact first, then
        # INNER/LEFT equi-joined dims). Refresh correctness contract: the
        # fact table (the one carrying the temporal column) is append-only;
        # every other joined table is STATIC between runs — the same
        # assumption TimescaleDB continuous aggregates make for joins.
        tables = list(spec.tables or (spec.table,))
        frames = {t: self.spark.table(t) for t in tables}
        if len(frames) > 1:
            seen_cols: Dict[str, str] = {}
            for t in tables:
                for c in frames[t].columns:
                    if c in seen_cols:
                        raise Unsupported(
                            f"ambiguous column {c} (in {seen_cols[c]} and {t})"
                        )
                    seen_cols[c] = t
        for step in spec.join_steps:
            jc = classify(step.on, cfg.temporal_columns) if step.on else None
            if jc is not None and jc.verdict is not Verdict.STABLE:
                raise Unsupported(f"join condition not stable: {jc.reason}")
        if ts_col not in frames[tables[0]].columns:
            raise Unsupported(
                f"temporal column {ts_col} must be on the fact table {tables[0]}"
            )

        # The joined-source schema is the concatenation of the per-table
        # schemas (unique names enforced above; joins don't retype fields),
        # so it composes WITHOUT building the join. The joined DataFrame
        # itself is built lazily: the SQL-template warm path names the
        # tables in its own FROM clause and never needs the DataFrame form,
        # so a standing templated refresh skips ~70 py4j calls of join
        # rebuilding per run.
        from pyspark.sql.types import StructType as _StructType

        base_schema = _StructType(
            [f for t in tables for f in frames[t].schema.fields]
        )
        base_cols = {f.name for f in base_schema.fields}
        _base_built: List[DataFrame] = []

        def get_base() -> DataFrame:
            if not _base_built:
                b = frames[tables[0]]
                for step in spec.join_steps:
                    if step.on is not None:
                        b = b.join(
                            frames[step.table], to_column(step.on), step.how
                        )
                    else:
                        b = b.crossJoin(frames[step.table])
                _base_built.append(b)
            return _base_built[0]

        # state group-by: the query's groups, plus a synthetic time bucket
        # when a dynamic bound needs one and the query itself has none
        bucket_gran = tgb.granularity if tgb else cfg.dynamic_granularity
        bucket_name = tgb.output_name if tgb else "__qc_bucket"
        state_group = list(spec.group_by)
        if dyn_bound is not None and tgb is None:
            from .plans.ir import Func as _Func, SelectItem as _SelectItem

            state_group.append(
                _SelectItem(
                    bucket_name,
                    _Func("date_trunc", (Lit(bucket_gran, "VARCHAR"), Col(ts_col))),
                )
            )

        plan_inputs = list(spec.aggregates)
        if spec.having is not None:
            from .plans.ir import SelectItem as _SelectItem

            plan_inputs.append(_SelectItem("__qc_having", spec.having))
        # schema-aware: decimal sum/avg get typed state (pinned at
        # decimal(38,s), finalize cast to Spark's exact output type);
        # composite expressions over decimal columns stay passthrough
        pkey = (query, base_schema.simpleString())
        plans = self._plan_cache.get(pkey)
        if plans is None:
            plans = plan_items(tuple(plan_inputs), base_schema)
            self._plan_cache[pkey] = plans

        # fingerprint = canonical IR + resolved source schema — the analogue
        # of plan.display_indent_schema() (``src/aggregate.rs:89``): schema
        # participates so a schema change invalidates the entry. For dynamic
        # bounds the fingerprint deliberately EXCLUDES the bound expression:
        # state is bound-independent, so `> now()-1h` and `> now()-7d` share
        # one entry.
        from .plans.ir import canon_predicate

        gb = ";".join(f"{s.name}={s.expr.canon()}" for s in state_group)
        ag = ";".join(f"{s.name}={s.expr.canon()}" for s in spec.aggregates)
        pred_c = canon_predicate(state_pred_expr)
        hav = f"|having={spec.having.canon()}" if spec.having is not None else ""
        # join steps carry the ON condition and join type — two queries over
        # the same tables differing only in the join shape must NOT collide
        # on one cache entry.
        js = ";".join(j.canon() for j in spec.join_steps)
        joins = f"|joins=[{js}]" if spec.join_steps else ""
        fingerprint = (
            f"Aggregate[table={','.join(tables)}{joins}|where={pred_c}"
            f"|group=[{gb}]|agg=[{ag}]]"
            f"{hav}|ts={ts_col}"
            f"{'|dynamic_state=' + bucket_gran if dyn_bound is not None else ''}"
            f"|schema={base_schema.simpleString()}"
        )

        now_ns = self._now_ns()
        entry = cfg.cache.entry(fingerprint)
        # dynamic-bound evaluation (value, bucket, epochs) — computed at
        # most once per query, and ONLY by the classic dyn assembly below
        # (the fused template renders the bound as SQL and never evaluates
        # it driver-side)
        dyn_eval = None

        # percentile/median histogram state guard (VERDICT r2 item 7): the
        # state is O(distinct values) per group — arm the store-time cap, and
        # short-circuit fingerprints that already tripped it this session.
        if any(p.histogram_states for p in plans):
            if fingerprint in self._hist_denied:
                raise Unsupported(
                    "exact percentile state previously exceeded "
                    f"percentile_max_distinct={cfg.percentile_max_distinct}"
                )
            entry.hist_cap = cfg.percentile_max_distinct

        # exact count(DISTINCT) set-state guard (r4/r5 ADVICE): same
        # O(distinct)/group growth risk, same store-time cap + session-wide
        # denial on trip — approx_count_distinct is the unbounded path.
        if any(getattr(p, "set_states", None) for p in plans):
            if fingerprint in self._hist_denied:
                raise Unsupported(
                    "count(DISTINCT) set state previously exceeded "
                    f"distinct_max_values={cfg.distinct_max_values}"
                )
            entry.set_cap = cfg.distinct_max_values

        # group/predicate Columns are pure functions of the query shape —
        # memoize the py4j-built handles alongside the aggregate plans so a
        # standing refresh doesn't recompile ~100 expressions per run
        # (Columns are immutable and DataFrame-independent, so reuse is safe)
        cols_memo = self._col_cache.get(pkey)
        if cols_memo is None:
            cols_memo = (
                [to_column(g.expr).alias(g.name) for g in state_group],
                to_column(state_pred_expr)
                if state_pred_expr is not None
                else None,
            )
            self._col_cache[pkey] = cols_memo
        group_partial, pred = cols_memo
        group_names = [g.name for g in state_group]
        partial_aggs: Dict[str, Column] = {}
        merge_aggs: Dict[str, Column] = {}
        for p in plans:
            partial_aggs.update(p.partial)
            merge_aggs.update(p.merge)
        state_cols = group_names + list(partial_aggs.keys())

        decision = Decision(
            sql=query, cached=True, fingerprint=fingerprint, now_ns=now_ns
        )

        def partial_agg(df: DataFrame) -> DataFrame:
            if cfg.salt_buckets > 0:
                # skew guard (config.salt_buckets): phase 1 shuffles on
                # (keys, salt) so a hot key fans out over salt_buckets
                # tasks; phase 2 merges the per-salt states — the same
                # merge the refresh itself uses, so state is identical by
                # associativity. (The singleton warm path needs no salt:
                # map-side combine already bounds reducer input to one row
                # per key per map task.)
                salt = (F.rand(seed=42) * cfg.salt_buckets).cast("int")
                p1 = (
                    df.withColumn("__qc_salt", salt)
                    .groupBy(*group_partial, F.col("__qc_salt"))
                    .agg(*[c.alias(n) for n, c in partial_aggs.items()])
                )
                return p1.groupBy(*[F.col(n) for n in group_names]).agg(
                    *[c.alias(n) for n, c in merge_aggs.items()]
                )
            return df.groupBy(*group_partial).agg(
                *[c.alias(n) for n, c in partial_aggs.items()]
            )

        shadow = f"{ts_col}_ns"

        def time_bounds(
            df: DataFrame, lo_ns: Optional[int] = None, hi_ns: Optional[int] = None
        ) -> DataFrame:
            """[lo, hi) scan bounds on the temporal column.

            Every state scan is upper-bounded by `ts < now` — an improvement
            over the reference (SURVEY §4.4.2: its state has no upper bound,
            so rows time-stamped beyond "now" at run 1 would double-count on
            refresh). With the bound, state_N covers exactly ts < now_N and
            fresh_{N+1} covers [now_N, now_{N+1}) — an exact partition, so
            results are "as of now" and the µs boundary can never dupe.

            Bounds via ``_push_time_bounds``: exact on the epoch-ns shadow,
            plus a redundant µs bound on the timestamp column itself so the
            filter reaches the parquet scan's ``PushedFilters`` even when
            the shadow is a derived column (µs/NTZ sources).
            """
            df = _push_time_bounds(df, ts_col, shadow, lo_ns, hi_ns)
            # partition-level bounds: redundant with the row bounds above
            # (a date-partition column is a coarsening of ts), but they are
            # plain comparisons on the PARTITION column → whole partitions
            # prune before any file is opened (config.temporal_partition_columns)
            pc = cfg.temporal_partition_columns.get(ts_col)
            if pc and pc in base_cols:
                import datetime as _dt

                epoch = _dt.datetime(1970, 1, 1)
                if lo_ns is not None:
                    lo_d = (epoch + _dt.timedelta(microseconds=lo_ns // 1000)).date()
                    df = df.filter(F.col(pc) >= F.lit(lo_d))
                if hi_ns is not None:
                    hi_d = (epoch + _dt.timedelta(microseconds=hi_ns // 1000)).date()
                    df = df.filter(F.col(pc) <= F.lit(hi_d))
            return df

        hit = entry.occupied
        state_is_local = False
        cached_state = None

        def data_scan_wm(lo_ns: Optional[int]):
            """``watermark_mode='data'``: collect max event time over
            ``[lo, now)`` FIRST, then bound the state scan by
            ``hi = max+1`` — the exact watermark that will be stored. The
            max job and the store job are separate Spark jobs; scanning to
            ``now`` while storing ``max+1`` would let a row landing between
            the jobs (event time above the collected max) be folded into
            state AND re-merged by the next refresh — permanent double
            counting (ADVICE r3, medium). Returns
            ``(scan_hi_ns, store_wm_ns)``; in "now" mode both are query
            time and no extra job runs."""
            if cfg.watermark_mode != "data":
                return now_ns, now_ns
            mxdf = get_base() if pred is None else get_base().filter(pred)
            mxdf = time_bounds(mxdf, lo_ns=lo_ns, hi_ns=now_ns)
            if shadow in base_cols:
                mxc = F.max(F.col(shadow))
            else:
                mxc = F.max(
                    F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000)
                )
            mx = mxdf.agg(mxc.alias("mx")).collect()[0]["mx"]
            if mx is not None:
                wm = int(mx) + 1
            elif lo_ns is not None:
                wm = lo_ns  # empty window: watermark unchanged
            else:
                wm = 0  # empty source: everything is still fresh
            return wm, wm

        def _local_state():
            # small state as a LOCAL relation: no file-scan stage, state
            # ships to executors with the task closure (one row per group)
            nonlocal cached_state, state_is_local
            state_tbl = entry.get_arrow()
            if state_tbl is not None:
                cached_state = self.spark.createDataFrame(state_tbl)
                state_is_local = True
            else:
                cached_state = entry.get(self.spark)

        if hit:
            try:
                st_cols = entry.state_columns()
                if st_cols is None:
                    _local_state()
                    st_cols = cached_state.columns
                if set(st_cols) != set(state_cols):
                    # schema contract violated (engine upgrade / hash
                    # collision): recompute rather than corrupt results.
                    cfg.log.warn(
                        fingerprint, "cached state schema mismatch; recomputing"
                    )
                    hit = False
            except Exception as e:  # unreadable state → self-heal as a miss
                cfg.log.warn(fingerprint, f"cached state unreadable ({e}); recomputing")
                hit = False

        store_wm_ns = now_ns  # overridden per-branch by data_scan_wm
        wm0 = entry.watermark_ns if hit else None
        if hit and wm0 is not None and (
            now_ns <= wm0
            # bounded-staleness policy: within the refresh interval, serve
            # as-of the stored watermark (config.min_refresh_interval_ns).
            # Not applied to dynamic-bound queries: their finalize
            # recomputes the boundary bucket from raw rows as-of now, which
            # would mix freshness horizons.
            or (dyn_bound is None and now_ns - wm0 < cfg.min_refresh_interval_ns)
        ):
            # hot read: the refresh window [wm, now) is provably empty (or
            # waived by the staleness policy), so the stored state already
            # answers — no scan, no store-back, one tiny local job.
            # (Queries re-run faster than data arrives — the reference's
            # repeated-dashboard case — pay only the state read.)
            decision.cache_hit = True
            decision.watermark_ns = entry.watermark_ns
            if cfg.result_memo:
                if dyn_bound is not None:
                    # dynamic results depend on the pinned now too (a repeat
                    # at the same now has the same boundary; an earlier now
                    # would pick a different lower and must NOT serve the
                    # memo) — the memo key carries (state watermark, now),
                    # which determines the bound exactly
                    memo = self._result_memo.get(
                        (fingerprint, ("dyn", entry.watermark_ns, now_ns))
                    )
                else:
                    memo = self._result_memo.get(
                        (fingerprint, entry.watermark_ns)
                    )
                if memo is not None:
                    # this session already finalized a result at this exact
                    # watermark: same state, same pure finalize → same rows.
                    decision.served_from_memo = True
                    cfg.log.info(
                        fingerprint, "cache hit: result memo (no Spark work)"
                    )
                    return memo, decision
            cfg.log.info(fingerprint, "cache hit: fresh window empty, serving state")
            merged = None
            if cached_state is None:
                _local_state()
            hot_state = cached_state
        elif hit:
            wm_ns = entry.watermark_ns
            if cached_state is None:
                # warm refresh: prefer the FILE-BACKED state form — the
                # refresh job's executors read the tiny state parquet
                # directly instead of the driver re-uploading it through
                # py4j on every refresh (~0.1 s/refresh saved)
                sdf = entry.state_df(self.spark)
                if sdf is not None:
                    cached_state = sdf
                    rows = entry.state_rows()
                    cap = getattr(entry, "DRIVER_COLLECT_MAX_ROWS", 500_000)
                    # template gate: same small-state contract get_arrow had
                    state_is_local = rows is not None and rows <= cap
                else:
                    _local_state()
            if (
                state_is_local
                and not spec.grouping_sets
                and not cfg.salt_buckets  # salted program is classic-only
                # data-watermark mode needs the max-ts job the template
                # doesn't carry: classic path only
                and cfg.watermark_mode == "now"
            ):
                # SQL-template fast path: the whole refresh program as ONE
                # JVM-parsed SQL string (built once per query shape) — the
                # resulting physical plan is identical to the DataFrame
                # program below, minus ~600 py4j round-trips per call. The
                # dynamic-bound variant additionally folds the boundary
                # recompute + final re-aggregate into the same program.
                pc_col = cfg.temporal_partition_columns.get(ts_col)
                pc_arg = pc_col if (pc_col and pc_col in base_cols) else None
                res = None
                memo_key = now_ns
                if dyn_bound is None:
                    # static ladder: nano (driver pyarrow scan, bytes-
                    # gated) → lite (one plain-sized job + driver merge)
                    # → fused template; each falls through
                    sntpl = self._static_nano_template(
                        pkey, fingerprint, spec, plans, state_group,
                        group_names, state_cols, partial_aggs, merge_aggs,
                        pred, state_pred_expr, ts_col, shadow in base_cols,
                        pc_arg, cached_state.schema, tables,
                    )
                    if sntpl is not None:
                        res = self._run_static_nano(
                            sntpl, entry, cached_state, wm_ns, now_ns,
                            decision, spec,
                        )
                    if res is None:
                        sltpl = self._static_lite_template(
                            pkey, fingerprint, spec, plans, state_group,
                            group_names, state_cols, partial_aggs, merge_aggs,
                            pred, ts_col, shadow in base_cols, pc_arg,
                            cached_state.schema, tables,
                        )
                        if sltpl is not None:
                            res = self._run_static_lite(
                                sltpl, entry, cached_state, wm_ns, now_ns,
                                decision, spec,
                            )
                    if res is None:
                        tpl = self._warm_template(
                            pkey, fingerprint, spec, plans, state_group,
                            group_names, state_cols, partial_aggs, merge_aggs,
                            pred, ts_col, shadow in base_cols, pc_arg,
                            cached_state.schema, tables,
                        )
                        if tpl is not None:
                            res = self._run_warm_template(
                                tpl, entry, cached_state, wm_ns, now_ns,
                                decision, spec, state_cols,
                            )
                else:
                    # tier ladder: nano (driver pyarrow scan, bytes-gated)
                    # → lite (plain-sized job + driver merge) → fused
                    # one-job template; each falls through on inadmission
                    ntpl = self._dyn_nano_template(
                        pkey, fingerprint, spec, plans, state_group,
                        group_names, state_cols, partial_aggs, merge_aggs,
                        pred, ts_col, shadow in base_cols, pc_arg,
                        cached_state.schema, tables,
                        bucket_name, bucket_gran, dyn_bound.op,
                        dyn_bound.rhs, pred_expr=state_pred_expr,
                    )
                    if ntpl is not None:
                        res = self._run_dyn_nano(
                            ntpl, entry, cached_state, wm_ns, now_ns,
                            dyn_bound.rhs, decision, spec,
                        )
                    if res is None:
                        ltpl = self._dyn_lite_template(
                            pkey, fingerprint, spec, plans, state_group,
                            group_names, state_cols, partial_aggs, merge_aggs,
                            pred, ts_col, shadow in base_cols, pc_arg,
                            cached_state.schema, tables,
                            bucket_name, bucket_gran, dyn_bound.op,
                        )
                        if ltpl is not None:
                            res = self._run_dyn_lite(
                                ltpl, entry, cached_state, wm_ns, now_ns,
                                dyn_bound.rhs, decision, spec,
                            )
                    if res is None:
                        tpl = self._dyn_warm_template(
                            pkey, fingerprint, spec, plans, state_group,
                            group_names, state_cols, partial_aggs, merge_aggs,
                            pred, ts_col, shadow in base_cols, pc_arg,
                            cached_state.schema, tables,
                            bucket_name, bucket_gran, dyn_bound.op,
                        )
                        if tpl is not None:
                            res = self._run_dyn_warm_template(
                                tpl, entry, cached_state, wm_ns, now_ns,
                                dyn_bound.rhs, decision, spec, state_cols,
                            )
                    if res is not None:
                        # the bound is a pure function of the pinned now,
                        # so (state watermark, now) keys the memo exactly
                        memo_key = ("dyn", now_ns, now_ns)
                if res is not None:
                    decision.cache_hit = True
                    decision.watermark_ns = wm_ns
                    cfg.log.info(
                        fingerprint,
                        f"cache hit: incremental refresh from watermark {wm_ns}",
                    )
                    # entry watermark is now now_ns: memo for hot re-reads
                    self._memo_result(fingerprint, memo_key, res)
                    return res, decision
            scan_hi, store_wm_ns = data_scan_wm(wm_ns)
            merged, obs = self._warm_merge(
                cached_state, wm_ns, scan_hi, get_base(), pred, time_bounds,
                plans, state_group, group_names, merge_aggs, partial_agg,
            )
            decision.cache_hit = True
            decision.refresh_tier = "classic"
            decision.watermark_ns = wm_ns
            decision.observation = obs
            cfg.log.info(
                fingerprint, f"cache hit: incremental refresh from watermark {wm_ns}"
            )
        else:
            donor = None
            if tgb is not None and not spec.grouping_sets and dyn_bound is None:
                donor = self._find_agg_donor(
                    spec, tgb, ts_col, fingerprint, now_ns,
                    state_cols, group_names, state_group,
                )
            if donor is not None:
                # SEMANTIC HIT (bucket coarsening): a FINER-bucketed entry
                # for the same query (e.g. hourly state for this daily
                # query) is re-truncated to this granularity and merged —
                # valid because date_trunc(coarse, date_trunc(fine, ts)) ==
                # date_trunc(coarse, ts) when fine nests into coarse, and
                # the merge is associative. Scans only [donor_wm, now):
                # a first-time daily dashboard pays O(new data), the
                # TimescaleDB continuous-aggregate rollup-reuse trick.
                d_state, d_wm, d_fp = donor
                scan_hi, store_wm_ns = data_scan_wm(d_wm)
                merged, obs = self._warm_merge(
                    d_state, d_wm, scan_hi, get_base(), pred, time_bounds,
                    plans, state_group, group_names, merge_aggs, partial_agg,
                )
                decision.cache_hit = True
                decision.semantic_donor = d_fp
                decision.watermark_ns = d_wm
                decision.observation = obs
                cfg.log.info(
                    fingerprint,
                    f"semantic hit: coarsened finer-bucket state from {d_fp}; "
                    f"scanned only rows since {d_wm}",
                )
            else:
                scan_hi, store_wm_ns = data_scan_wm(None)
                df = get_base() if pred is None else get_base().filter(pred)
                df = time_bounds(df, hi_ns=scan_hi)
                merged = partial_agg(df)
                cfg.log.info(fingerprint, "cache miss: computing and storing state")

        if (
            tgb is not None
            and not spec.grouping_sets
            and dyn_bound is None
            and fingerprint not in self._agg_registry
        ):
            # durable donor index for bucket-coarsening subsumption
            self._agg_registry.add(fingerprint)
            try:
                import json as _json

                from .plans.ir import ir_to_json

                cfg.cache.put_tag(
                    fingerprint,
                    "agg_spec",
                    _json.dumps({"spec": ir_to_json(spec), "ts_col": ts_col}),
                )
            except Exception:
                pass

        # watermark to STORE: query time ("now" mode, reference behavior) or
        # max-event-time-seen + 1 ("data" mode, late-data safety — SURVEY §7
        # hard-part 3), set by data_scan_wm ABOVE the state scan so the scan
        # is bounded by the stored watermark (hot reads store nothing).

        # Fused fast path (simple shapes): ONE job computes state AND final
        # columns together; the state is stored from the collected Arrow
        # table (no second scan) and the result is finished driver-side —
        # including the ORDER BY, which as a Spark global sort on a local
        # relation would cost a range-partitioner sampling pass + shuffle.
        if not spec.grouping_sets and dyn_bound is None:
            fused = self._finalize_fused(
                entry,
                merged,
                None if merged is not None else (hot_state if state_is_local else None),
                plans,
                spec,
                state_cols,
                store_wm_ns,
                decision,
            )
            if fused is not None:
                # warm refresh advanced the watermark to store_wm_ns; a hot
                # read served state as-of the existing watermark
                self._memo_result(
                    fingerprint,
                    store_wm_ns if merged is not None else decision.watermark_ns,
                    fused,
                )
                return fused, decision

        # store-back (reference always wraps in CacheUpdateAggregateExec so
        # run 1 populates and run N refreshes, ``src/aggregate.rs:399``); we
        # store *merged* (compacted) state — SURVEY §3.3 improvement — and
        # finalize from the stored copy so the source is scanned exactly once.
        # (hot reads — empty refresh window — skip the store entirely.)
        if merged is not None:
            self.last_refresh_df = merged
        stored = (
            hot_state
            if merged is None
            else entry.put(store_wm_ns, merged, self.spark)
        )

        if spec.grouping_sets:
            # ROLLUP/CUBE/GROUPING SETS: state is kept at the FINEST
            # granularity (all group keys); each grouping set is a
            # re-aggregation of that state (merge associativity — the same
            # law the refresh relies on), with the absent keys as typed
            # NULLs. The union reproduces Spark's rollup output exactly,
            # including the natural-NULL-vs-subtotal row pair.
            if dyn_bound is not None:
                raise Unsupported("grouping sets with a dynamic bound")
            def grouping_flag_cols(st_idx):
                """grouping()/grouping_id() are pure functions of WHICH set a
                row came from — emit them as typed literals per part
                (tinyint / bigint, matching Spark's native output types)."""
                cols = []
                for item in spec.grouping_fn_items:
                    args = item.expr.args or tuple(
                        g.expr for g in spec.group_by
                    )  # grouping_id() with no args = all keys

                    def flag(arg) -> int:
                        for i, g in enumerate(spec.group_by):
                            if g.expr == arg or (
                                isinstance(arg, Col) and arg.name == g.name
                            ):
                                return 0 if i in st_idx else 1
                        raise Unsupported("grouping() argument not a group key")

                    if item.expr.name.lower() == "grouping":
                        cols.append(
                            F.lit(flag(args[0])).cast("tinyint").alias(item.name)
                        )
                    else:
                        gid = 0
                        for arg in args:
                            gid = gid * 2 + flag(arg)
                        cols.append(F.lit(gid).cast("bigint").alias(item.name))
                return cols

            dt_map = dict(stored.dtypes)
            parts = []
            for st_idx in spec.grouping_sets:
                keys = [group_names[i] for i in st_idx]
                gagg = stored.groupBy(*[F.col(k) for k in keys]).agg(
                    *[c.alias(n) for n, c in merge_aggs.items()]
                )
                sel = (
                    [F.col(k) for k in keys]
                    + [
                        F.lit(None).cast(dt_map[n]).alias(n)
                        for n in group_names
                        if n not in keys
                    ]
                    + [F.col(n) for n in merge_aggs]
                    + grouping_flag_cols(st_idx)
                )
                parts.append(gagg.select(*sel))
            acc = parts[0]
            for p in parts[1:]:
                acc = acc.unionByName(p)
            stored = acc

        if dyn_bound is not None:
            # evaluate the bound once at plan time (reference captures "now"
            # the same way, ``src/aggregate.rs:375-382``)
            if dyn_eval is None:
                dyn_eval = self._eval_bound_and_bucket(
                    dyn_bound.rhs, now_ns, bucket_gran
                )
            lower, boundary = dyn_eval[0], dyn_eval[1]
            decision.dynamic_lower = lower
            bucket_dtype = dict(stored.dtypes)[bucket_name]
            boundary_lit = F.lit(boundary).cast(bucket_dtype)
            # full buckets strictly above the boundary come from state; the
            # boundary bucket is recomputed exactly from raw rows with a
            # PUSHABLE range predicate on the temporal column.
            full = stored.filter(F.col(bucket_name) > boundary_lit)
            braw = get_base() if pred is None else get_base().filter(pred)
            cmp_op = (
                (F.col(ts_col) > F.lit(lower))
                if dyn_bound.op == ">"
                else (F.col(ts_col) >= F.lit(lower))
            )
            # the bound's and bucket-end's epoch-µs forms come straight
            # from _eval_bound_and_bucket's JVM evaluation in the SESSION
            # timezone — no Python-side naive-datetime arithmetic (which
            # silently assumed UTC) and no +1h DST slack: the bucket end
            # is date_trunc + INTERVAL, DST/calendar exact in any tz.
            lower_ns_v = dyn_eval[2] * 1000
            be_us = dyn_eval[4]
            # state is as-of now, so the boundary recompute must be too.
            # hi bound: the boundary BUCKET's end, not now — every boundary
            # row satisfies ts < bucket_end, so capping the scan there
            # prunes the (window - 1 bucket) tail the non-pushable
            # date_trunc equality below would otherwise read and discard.
            hi_eff = now_ns if be_us is None else min(now_ns, be_us * 1000)
            braw = time_bounds(braw, lo_ns=lower_ns_v, hi_ns=hi_eff)
            braw = braw.filter(
                cmp_op
                & (
                    F.date_trunc(bucket_gran, F.col(ts_col)).cast(bucket_dtype)
                    == boundary_lit
                )
            )
            dtypes2 = {f.name: f.dataType for f in stored.schema.fields}
            singletons2: Dict[str, Column] = {}
            use_singleton2 = all(p.singleton is not None for p in plans)
            if use_singleton2:
                for p in plans:
                    singletons2.update(p.singleton)
                boundary_state = braw.select(
                    *[
                        to_column(g.expr).cast(dtypes2[g.name]).alias(g.name)
                        for g in state_group
                    ],
                    *[c.cast(dtypes2[n]).alias(n) for n, c in singletons2.items()],
                )
            else:
                boundary_state = braw.groupBy(*group_partial).agg(
                    *[c.alias(n) for n, c in partial_aggs.items()]
                )
            unioned2 = full.unionByName(boundary_state)
            # collapse the synthetic bucket for queries that didn't group on it
            result_groups = [g.name for g in spec.group_by]
            stored = unioned2.groupBy(*[F.col(n) for n in result_groups]).agg(
                *[c.alias(n) for n, c in merge_aggs.items()]
            )
            cfg.log.info(
                fingerprint,
                f"dynamic bound: full buckets > {boundary}, boundary bucket "
                f"recomputed from raw rows >= {lower}",
            )

        final_select: List[Column] = []
        fin_by_name = {p.name: p.finalize for p in plans}
        for name in spec.select_order:
            if name in fin_by_name:
                final_select.append(fin_by_name[name])
            else:
                final_select.append(F.col(name))
        if spec.having is not None:
            out = (
                stored.select(*final_select, fin_by_name["__qc_having"])
                .filter(F.col("__qc_having"))
                .drop("__qc_having")
            )
        else:
            out = stored.select(*final_select)

        out = self._apply_order_limit(out, spec)
        return out, decision

    def _finalize_fused(
        self,
        entry,
        merged: Optional[DataFrame],
        hot_state: Optional[DataFrame],
        plans,
        spec: AggSpec,
        state_cols: List[str],
        now_ns: int,
        decision: Decision,
    ) -> Optional[DataFrame]:
        """Single-job store + finalize for simple aggregate shapes.

        The merged state plan is augmented with the finalize columns and
        collected ONCE via Arrow (inside ``entry.put_split``, which persists
        the state part). HAVING, ORDER BY and LIMIT are then applied to the
        driver-local result — avoiding both the post-store re-read and the
        global-sort exchange a LocalRelation ``orderBy`` would pay. Returns
        None when the fast path doesn't apply (caller falls back)."""
        from pyspark.sql.types import StructType

        layout = self._fused_layout(spec)
        if layout is None:
            return None  # duplicate output aliases: keep the classic path
        out_names, order_names, extra_names = layout
        fin_by_name = {p.name: p.finalize for p in plans}
        aug_cols = [F.col(n) for n in state_cols]
        for i, name in enumerate(out_names):
            c = fin_by_name[name] if name in fin_by_name else F.col(name)
            aug_cols.append(c.alias(f"__fin{i}"))
        for nm in extra_names:
            aug_cols.append(F.col(nm).alias(f"__ord_{nm}"))
        if spec.having is not None:
            aug_cols.append(fin_by_name["__qc_having"].alias("__fin_hv"))

        base_idx = len(state_cols)
        if merged is not None:
            augmented = merged.select(*aug_cols)
            self.last_refresh_df = augmented
            aug_schema = augmented.schema
            state_schema = StructType(aug_schema.fields[:base_idx])
            fresh_cb = (
                decision.fresh_rows if decision.observation is not None else None
            )
            tbl = entry.put_split(
                now_ns, augmented, state_cols, state_schema, self.spark, fresh_cb
            )
            if tbl is None:
                return None
        else:
            if hot_state is None:
                return None
            # hot read: no store-back; the state is already driver-local, so
            # the finalize job runs over a LocalRelation (tiny, no scan).
            augmented = hot_state.select(*aug_cols)
            aug_schema = augmented.schema
            tbl = augmented.toArrow()

        return self._arrow_result(
            tbl, list(aug_schema.fields), base_idx, spec,
            out_names, extra_names, order_names,
        )

    def _fused_layout(self, spec: AggSpec):
        """Output-column layout shared by the fused and SQL-template paths:
        (out_names, order_names, extra order-only ride-along names)."""
        out_names = list(spec.select_order)
        if len(set(out_names)) != len(out_names):
            return None
        # ORDER BY keys that aren't output columns (e.g. ORDER BY a group
        # key that was not selected) ride along and are dropped after sort
        order_names: List[str] = []
        extra_names: List[str] = []
        if spec.order_by:
            for o in spec.order_by:
                nm = self._resolve_order_name(o.expr, spec)
                order_names.append(nm)
                if nm not in out_names and nm not in extra_names:
                    extra_names.append(nm)
        return out_names, order_names, extra_names

    def _arrow_result(
        self,
        tbl,
        aug_fields,
        base_idx: int,
        spec: AggSpec,
        out_names: List[str],
        extra_names: List[str],
        order_names: List[str],
    ) -> DataFrame:
        """Driver-side finalize of a collected augmented table: HAVING
        filter, Spark-semantics sort (nulls placement, NaN-greatest guard),
        LIMIT, and re-entry into Spark as a LocalRelation."""
        from pyspark.sql.types import StructField, StructType

        import pyarrow as pa
        import pyarrow.compute as pc

        n_fin = len(out_names)
        if spec.having is not None:
            tbl = tbl.filter(pc.fill_null(tbl.column(tbl.num_columns - 1), False))

        res_names = out_names + extra_names
        res = tbl.select(list(range(base_idx, base_idx + n_fin + len(extra_names))))
        res = res.rename_columns(res_names)
        res_fields = [
            StructField(res_names[i], f.dataType, f.nullable)
            for i, f in enumerate(aug_fields[base_idx : base_idx + n_fin + len(extra_names)])
        ]

        sorted_locally = False
        if spec.order_by:
            keys = []
            placements = set()
            for o, nm in zip(spec.order_by, order_names):
                asc = not o.desc
                nf = asc if o.nulls_first is None else o.nulls_first
                placements.add("at_start" if nf else "at_end")
                keys.append((nm, "ascending" if asc else "descending"))
            if len(placements) == 1:
                nan_free = True
                for nm, _ in keys:
                    col = res.column(nm)
                    if pa.types.is_floating(col.type):
                        any_nan = pc.any(pc.is_nan(col)).as_py()
                        if any_nan:  # Spark sorts NaN greatest; arrow differs
                            nan_free = False
                            break
                if nan_free:
                    idx = pc.sort_indices(
                        res, sort_keys=keys, null_placement=placements.pop()
                    )
                    res = res.take(idx)
                    sorted_locally = True
                    if spec.limit is not None:
                        res = res.slice(0, spec.limit)
        if sorted_locally or not spec.order_by:
            if extra_names:
                res = res.select(list(range(n_fin)))
                res_fields = res_fields[:n_fin]
            out = self.spark.createDataFrame(res, schema=StructType(res_fields))
            if spec.limit is not None and not spec.order_by:
                out = out.limit(spec.limit)
            return out
        # mixed null placements / NaN present: Spark-side local sort (single
        # partition → no range exchange), then project the extras away.
        out = self.spark.createDataFrame(res, schema=StructType(res_fields))
        sort_cols = [
            _order_col(nm, o) for o, nm in zip(spec.order_by, order_names)
        ]
        out = out.coalesce(1).sortWithinPartitions(*sort_cols)
        if spec.limit is not None:
            out = out.limit(spec.limit)
        return out.select(*out_names)

    def _warm_merge(
        self,
        cached_state: DataFrame,
        wm_lo: int,
        now_ns: int,
        base: DataFrame,
        pred: Optional[Column],
        time_bounds,
        plans,
        state_group,
        group_names: List[str],
        merge_aggs: Dict[str, Column],
        partial_agg,
    ):
        """The classic warm refresh program: fresh rows in ``[wm_lo, now)``
        as singleton states (map-side combine = partial aggregation, ONE
        shuffle; explicit partial agg for sketch states), unioned with
        ``cached_state`` and merged. Shared by real hits and semantic
        (coarsened-donor) hits. Returns (merged DataFrame, Observation)."""
        fresh = base
        if pred is not None:
            fresh = fresh.filter(pred)
        fresh = time_bounds(fresh, lo_ns=wm_lo, hi_ns=now_ns)
        self._obs_counter += 1
        obs = Observation(f"qc_fresh_{self._obs_counter}")
        fresh = fresh.observe(obs, F.count(F.lit(1)).alias("rows"))
        singletons: Dict[str, Column] = {}
        use_singleton = True
        for p in plans:
            if p.singleton is None:
                use_singleton = False
                break
            singletons.update(p.singleton)
        if use_singleton:
            from .functions.partial import relax_nullability as _relax

            dtypes = {f.name: _relax(f.dataType) for f in cached_state.schema.fields}
            fresh_state = fresh.select(
                *[
                    to_column(g.expr).cast(dtypes[g.name]).alias(g.name)
                    for g in state_group
                ],
                *[c.cast(dtypes[n]).alias(n) for n, c in singletons.items()],
            )
        else:
            fresh_state = partial_agg(fresh)
        unioned = cached_state.unionByName(fresh_state)
        merged = unioned.groupBy(*[F.col(n) for n in group_names]).agg(
            *[c.alias(n) for n, c in merge_aggs.items()]
        )
        return merged, obs

    #: fine granularity → the coarser granularities it nests into exactly
    #: (date_trunc(coarse, date_trunc(fine, ts)) == date_trunc(coarse, ts)).
    #: week is excluded as a FINE source: weeks cross month/quarter/year
    #: boundaries, so re-truncating week starts is wrong.
    _COARSEN_OK = {
        "microsecond": {"millisecond", "second", "minute", "hour", "day", "week", "month", "quarter", "year"},
        "millisecond": {"second", "minute", "hour", "day", "week", "month", "quarter", "year"},
        "second": {"minute", "hour", "day", "week", "month", "quarter", "year"},
        "minute": {"hour", "day", "week", "month", "quarter", "year"},
        "hour": {"day", "week", "month", "quarter", "year"},
        "day": {"week", "month", "quarter", "year"},
        "month": {"quarter", "year"},
        "quarter": {"year"},
    }

    def _find_agg_donor(
        self,
        spec: AggSpec,
        tgb,
        ts_col: str,
        own_fp: str,
        now_ns: int,
        state_cols: List[str],
        group_names: List[str],
        state_group,
    ):
        """A stored aggregate entry for the SAME query at a FINER temporal
        bucket, usable to answer this one by re-truncation + merge.
        Returns (coarsened state DataFrame aligned to state_cols,
        watermark_ns, donor fingerprint) or None."""
        import json as _json

        from .plans.classify import find_temporal_group_by
        from .plans.ir import (
            Col as _ColRef,
            canon_predicate,
            ir_from_json,
            transform as _transform,
        )

        cfg = self.config
        try:
            tag_blobs = cfg.cache.tags("agg_spec")
        except Exception:
            return None
        if not tag_blobs:
            return None

        def aggs_canon(s):
            return ";".join(f"{i.name}={i.expr.canon()}" for i in s.aggregates)

        def nonbucket_canon(s, bucket_name):
            return ";".join(
                f"{i.name}={i.expr.canon()}"
                for i in s.group_by
                if i.name != bucket_name
            )

        coarse = tgb.granularity.lower()
        want_pred = canon_predicate(spec.predicate)
        want_aggs = aggs_canon(spec)
        want_hav = spec.having.canon() if spec.having is not None else ""
        want_joins = ";".join(j.canon() for j in spec.join_steps)
        want_rest = nonbucket_canon(spec, tgb.output_name)

        for fp, blob in tag_blobs.items():
            if fp == own_fp:
                continue
            try:
                data = _json.loads(blob)
                dspec = ir_from_json(data["spec"])
                d_ts = data.get("ts_col")
            except Exception:
                continue
            if d_ts != ts_col or dspec.table != spec.table:
                continue
            if dspec.grouping_sets:
                continue
            if ";".join(j.canon() for j in dspec.join_steps) != want_joins:
                continue
            if canon_predicate(dspec.predicate) != want_pred:
                continue
            if aggs_canon(dspec) != want_aggs:
                continue
            d_hav = dspec.having.canon() if dspec.having is not None else ""
            if d_hav != want_hav:
                continue
            tgb_d, ok = find_temporal_group_by(
                dspec.group_by, cfg.temporal_columns, cfg.group_by_functions
            )
            if not ok or tgb_d is None:
                continue
            fine = tgb_d.granularity.lower()
            if coarse not in self._COARSEN_OK.get(fine, ()):
                continue
            if nonbucket_canon(dspec, tgb_d.output_name) != want_rest:
                continue
            d_entry = cfg.cache.entry(fp)
            if not d_entry.occupied:
                continue
            d_wm = d_entry.watermark_ns
            if d_wm is None or d_wm > now_ns:
                continue
            try:
                tbl = d_entry.get_arrow()
                d_state = (
                    self.spark.createDataFrame(tbl)
                    if tbl is not None
                    else d_entry.get(self.spark)
                )
                # donor columns: its group names + the (identical) agg
                # state names. Re-truncate the donor's bucket column with
                # THIS query's bucket expression (ts substituted by the
                # donor bucket), keep other keys and state columns as-is.
                def _sub(e):
                    if isinstance(e, _ColRef) and e.name == ts_col:
                        return _ColRef(tgb_d.output_name)
                    return e

                sel = []
                for g in state_group:
                    if g.name == tgb.output_name:
                        coarsen = _transform(g.expr, _sub)
                        sel.append(to_column(coarsen).alias(g.name))
                    else:
                        sel.append(F.col(g.name))
                for n in state_cols:
                    if n not in group_names:
                        sel.append(F.col(n))
                coarsened = d_state.select(*sel)
                if set(coarsened.columns) != set(state_cols):
                    continue
                return coarsened, d_wm, fp
            except Exception as e:
                cfg.log.warn(own_fp, f"coarsening donor {fp} unusable ({e})")
                continue
        return None

    # -- SQL-template warm path ---------------------------------------------

    def _sql_of(self, col: Column) -> str:
        """Render a compiled Column back to parseable SQL text via the JVM
        expression converter. Paid ONCE per template build; lets the whole
        warm-path program run as a single ``spark.sql`` call instead of
        hundreds of py4j DataFrame-building round-trips per refresh."""
        return self.spark._jsparkSession.expression(col._jc).sql()

    def _warm_template(
        self,
        pkey,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
    ) -> Optional[dict]:
        """Memoized SQL template for the incremental-refresh program.

        The template is the textual twin of the classic warm plan —
        ``finalize(merge(union(state_view, singleton(fresh))))`` — with the
        watermark bounds as placeholder tokens, plus a rider aggregate
        ``sum(__qc_isfresh)`` that reproduces the Observation row count for
        free. None ⇒ this query shape can't be templated (stay classic)."""
        key = (pkey[0], pkey[1], state_schema.simpleString())
        if key in self._tpl_cache:
            return self._tpl_cache[key]
        tpl = None
        try:
            tpl = self._build_warm_template(
                fingerprint, spec, plans, state_group, group_names, state_cols,
                partial_aggs, merge_aggs, pred, ts_col, shadow_ok, part_col,
                state_schema, tables,
            )
        except Exception as e:
            self.config.log.info(
                fingerprint, f"sql-template not available ({e}); using classic plan"
            )
            tpl = None
        if tpl is not None:
            tpl["key"] = key
        self._tpl_cache[key] = tpl
        return tpl

    def _tpl_core(
        self,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        state_schema,
        tables: List[str],
    ) -> Optional[dict]:
        """SQL fragments shared by the static and dynamic warm templates:
        FROM clause, fresh/boundary partial select items, merge items, and
        the finalize item list. None ⇒ this shape can't be templated."""
        layout = self._fused_layout(spec)
        if layout is None:
            return None
        out_names, order_names, extra_names = layout
        sql_of = self._sql_of

        def q(n: str) -> str:
            return "`" + n.replace("`", "``") + "`"

        fin_raw = {p.name: p.finalize_raw for p in plans}
        dtypes = {f.name: f.dataType for f in state_schema.fields}
        g_sql = {g.name: sql_of(to_column(g.expr)) for g in state_group}

        singletons: Dict[str, Column] = {}
        use_singleton = True
        for p in plans:
            if p.singleton is None:
                use_singleton = False
                break
            singletons.update(p.singleton)

        # FROM: fact table, then the left-deep join steps (same static-dims
        # refresh contract as the DataFrame path)
        from_sql = q(tables[0])
        for step in spec.join_steps:
            if step.on is None:
                from_sql += f" CROSS JOIN {q(step.table)}"
            else:
                kw = "LEFT JOIN" if step.how == "left" else "JOIN"
                from_sql += f" {kw} {q(step.table)} ON {sql_of(to_column(step.on))}"

        # partial select items: singleton row-states when every aggregate
        # has one (the one-shuffle plan), else explicit partial aggregates
        items = []
        for n in state_cols:
            if n in g_sql:
                items.append(f"{g_sql[n]} AS {q(n)}")
            elif use_singleton:
                t = dtypes[n].simpleString()
                items.append(f"CAST({sql_of(singletons[n])} AS {t}) AS {q(n)}")
            else:
                items.append(f"{sql_of(partial_aggs[n])} AS {q(n)}")

        merge_items = [
            f"{sql_of(merge_aggs[n])} AS {q(n)}"
            for n in state_cols
            if n not in g_sql
        ]

        # finalize item list (output expressions + order ride-alongs + the
        # hidden HAVING flag) — the layout _arrow_result expects
        fin_exprs = []
        for i, name in enumerate(out_names):
            if name in fin_raw:
                fin_exprs.append(f"{sql_of(fin_raw[name])} AS {q('__fin%d' % i)}")
            else:
                fin_exprs.append(f"{q(name)} AS {q('__fin%d' % i)}")
        for nm in extra_names:
            fin_exprs.append(f"{q(nm)} AS {q('__ord_' + nm)}")
        if spec.having is not None:
            fin_exprs.append(f"{sql_of(fin_raw['__qc_having'])} AS {q('__fin_hv')}")

        ts_is_ts = False
        try:
            from pyspark.sql.types import TimestampNTZType, TimestampType

            ts_type = dict(
                (f.name, f.dataType)
                for f in self.spark.table(tables[0]).schema.fields
            ).get(ts_col)
            ts_is_ts = isinstance(ts_type, (TimestampType, TimestampNTZType))
        except Exception:
            pass  # pushdown companion is an optimization, never required

        return {
            "out_names": out_names,
            "order_names": order_names,
            "extra_names": extra_names,
            "q": q,
            "g_sql": g_sql,
            "dtypes": dtypes,
            "use_singleton": use_singleton,
            "from_sql": from_sql,
            "items": items,
            "merge_items": merge_items,
            "fin_exprs": fin_exprs,
            "pred_sql": f"({sql_of(pred)})" if pred is not None else None,
            "gb_exprs": ", ".join(g_sql[n] for n in group_names),
            "sel_groups": ", ".join(q(n) for n in group_names),
            "state_sel": ", ".join(q(c) for c in state_cols),
            "ts_is_ts": ts_is_ts,
        }

    def _build_warm_template(
        self,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
    ) -> Optional[dict]:
        import hashlib

        core = self._tpl_core(
            spec, plans, state_group, group_names, state_cols, partial_aggs,
            merge_aggs, pred, ts_col, state_schema, tables,
        )
        if core is None:
            return None
        q = core["q"]

        # WHERE: stable predicate + exact [wm, now) tiling + optional
        # partition-column coarsening for partition pruning. Same shape as
        # ``_push_time_bounds``: the ns shadow gives exactness; a REDUNDANT
        # µs bound on the timestamp column itself gives scan pushdown when
        # the shadow is a derived column (µs/NTZ sources) — floor the lower
        # / ceil the upper so the superset never drops a row the ns bound
        # admits.
        conds = []
        if core["pred_sql"] is not None:
            conds.append(core["pred_sql"])
        if shadow_ok:
            shadow = q(f"{ts_col}_ns")
            if core["ts_is_ts"]:
                # µs-aligned watermarks make the pushable µs bounds EXACT
                # (ts_ns ≥ 1000k ⟺ µs(ts) ≥ k for any integer ts_ns), so
                # the per-row ns-shadow comparisons are guarded out at
                # substitution time: __QC_NSG__ becomes `true` when both
                # bounds are multiples of 1000 and BooleanSimplification
                # erases the whole conjunct — the scan then evaluates only
                # the native µs comparisons. Misaligned bounds keep the
                # exact ns tiling (guard `false` folds to the ns conds).
                conds.append(
                    f"(__QC_NSG__ OR ({shadow} >= __QC_WM_NS__ "
                    f"AND {shadow} < __QC_NOW_NS__))"
                )
                conds.append(
                    f"{q(ts_col)} >= timestamp_micros(__QC_WM_US_FLOOR__)"
                )
                conds.append(f"{q(ts_col)} < timestamp_micros(__QC_NOW_US__)")
            else:
                conds.append(f"{shadow} >= __QC_WM_NS__")
                conds.append(f"{shadow} < __QC_NOW_NS__")
        else:
            conds.append(f"{q(ts_col)} >= timestamp_micros(__QC_WM_US__)")
            conds.append(f"{q(ts_col)} < timestamp_micros(__QC_NOW_US__)")
        if part_col:
            conds.append(f"{q(part_col)} >= DATE'__QC_LO_D__'")
            conds.append(f"{q(part_col)} <= DATE'__QC_HI_D__'")
        where_sql = " AND ".join(conds)

        view = f"__qc_state_{hashlib.md5(fingerprint.encode()).hexdigest()[:12]}"
        isf = q("__qc_isfresh")

        # fresh side: singleton row-states when every aggregate has one (the
        # one-shuffle plan), else an explicit partial sub-aggregate
        items = core["items"]
        if core["use_singleton"]:
            fresh_sql = (
                f"SELECT {', '.join(items)}, 1 AS {isf} "
                f"FROM {core['from_sql']} WHERE {where_sql}"
            )
        else:
            fresh_sql = (
                f"SELECT {', '.join(items)}, count(1) AS {isf} "
                f"FROM {core['from_sql']} WHERE {where_sql}"
                + (f" GROUP BY {core['gb_exprs']}" if group_names else "")
            )

        state_sel = core["state_sel"]
        union_sql = (
            f"{fresh_sql} UNION ALL SELECT {state_sel}, 0 AS {isf} FROM {q(view)}"
        )

        # merge: one hash aggregate over the union — map-side combine of the
        # singleton rows IS the partial aggregation (single shuffle)
        sel_groups = core["sel_groups"]
        head = f"{sel_groups}, " if group_names else ""
        m_sql = (
            f"SELECT {head}{', '.join(core['merge_items'])}, "
            f"sum({isf}) AS {q('__qc_fresh')} "
            f"FROM ({union_sql}) __qc_u"
            + (f" GROUP BY {sel_groups}" if group_names else "")
        )

        # finalize: state columns ride through for the store-back, followed
        # by the output expressions — same layout _arrow_result expects,
        # with the fresh-row counter as the (dropped) last column
        fin_items = [q(n) for n in state_cols]
        fin_items.extend(core["fin_exprs"])
        fin_items.append(q("__qc_fresh"))
        sql = f"SELECT {', '.join(fin_items)} FROM ({m_sql}) __qc_m"

        if "lambdafunction(" in sql:
            # higher-order-function lambdas (RLE-histogram percentile state)
            # don't round-trip through Expression.sql() — the rendered
            # lambdafunction(...) form is not parseable SQL. Stay classic.
            return None

        return {
            "sql": sql,
            "view": view,
            "out_names": core["out_names"],
            "order_names": core["order_names"],
            "extra_names": core["extra_names"],
        }


    def _bind_state_source(self, tpl: dict, entry, cached_state: DataFrame,
                           sql: str) -> str:
        """Bind the template's state reference by (re-)registering the temp
        view over the entry's current state DataFrame.

        Measured alternative: inlining the entry's parquet path as
        ``parquet.`path``` (``entry.state_parquet_paths()``) skips this
        registration (~8ms) but pays footer schema-inference during
        analysis (~60ms/refresh — the state dir changes on every
        store-back swap, so nothing caches) — strictly worse. The view
        carries the explicit meta-schema read, so analysis never touches
        the parquet footer."""
        cached_state.createOrReplaceTempView(tpl["view"])
        return sql

    @contextmanager
    def _refresh_confs(self):
        """Scope down shuffle width for the one templated-refresh job: its
        merge shuffle carries O(state-cardinality) rows (the template gate
        only admits driver-local-small state), so 32+ reduce tasks and
        AQE's per-stage re-planning rounds are pure scheduling overhead at
        refresh time. Re-entrant (the streaming maintainer may refresh on
        another thread): only the outermost scope saves/restores, so a
        race can't leave the session pinned to the refresh settings."""
        want = {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
        }
        with self._conf_lock:
            self._conf_depth += 1
            if self._conf_depth == 1:
                saved = {}
                for k, v in want.items():
                    try:
                        saved[k] = self.spark.conf.get(k)
                        self.spark.conf.set(k, v)
                    except Exception:
                        pass
                self._conf_saved = saved
        try:
            yield
        finally:
            with self._conf_lock:
                self._conf_depth -= 1
                if self._conf_depth == 0:
                    for k, v in self._conf_saved.items():
                        try:
                            self.spark.conf.set(k, v)
                        except Exception:
                            pass
                    self._conf_saved = {}

    def _run_warm_template(
        self,
        tpl: dict,
        entry,
        cached_state: DataFrame,
        wm_ns: int,
        now_ns: int,
        decision: Decision,
        spec: AggSpec,
        state_cols: List[str],
    ) -> Optional[DataFrame]:
        """Execute the templated refresh: ~4 py4j calls + one Spark job.

        Store-back comes from the same collected Arrow table (no second
        scan); a zero-row refresh window only advances the watermark."""
        from pyspark.sql.types import StructType

        try:
            # non-negativity required for erasure: see _sub_time_tokens
            aligned = wm_ns % 1000 == 0 and now_ns % 1000 == 0 and wm_ns >= 0
            sql = (
                tpl["sql"]
                .replace("__QC_NSG__", "true" if aligned else "false")
                .replace("__QC_WM_NS__", str(wm_ns))
                .replace("__QC_NOW_NS__", str(now_ns))
            )
            if "__QC_WM_US__" in sql:
                sql = sql.replace("__QC_WM_US__", str(-(-wm_ns // 1000)))
            if "__QC_WM_US_FLOOR__" in sql:
                # superset companion of the exact ns bound: floor, not ceil
                sql = sql.replace("__QC_WM_US_FLOOR__", str(wm_ns // 1000))
            if "__QC_NOW_US__" in sql:
                sql = sql.replace("__QC_NOW_US__", str(-(-now_ns // 1000)))
            if "__QC_LO_D__" in sql:
                import datetime as _dt

                epoch = _dt.datetime(1970, 1, 1)
                lo_d = (epoch + _dt.timedelta(microseconds=wm_ns // 1000)).date()
                hi_d = (epoch + _dt.timedelta(microseconds=now_ns // 1000)).date()
                sql = sql.replace("__QC_LO_D__", lo_d.isoformat())
                sql = sql.replace("__QC_HI_D__", hi_d.isoformat())
            sql = self._bind_state_source(tpl, entry, cached_state, sql)
            with self._refresh_confs():
                df = self.spark.sql(sql)
                self.last_refresh_df = df
                aug_fields = list(df.schema.fields)
                tbl = df.toArrow()  # the ONE job over the data
        except Exception as e:
            # poison this template (wrong render, unregistered function,
            # ...) and fall back to the classic DataFrame program
            self._tpl_cache[tpl["key"]] = None
            self.config.log.warn(
                decision.fingerprint or "",
                f"sql-template warm path failed ({e}); falling back",
            )
            return None

        import pyarrow.compute as pc

        last = tbl.num_columns - 1
        fresh = pc.sum(tbl.column(last)).as_py()
        decision.fresh_rows_value = int(fresh or 0)
        tbl = tbl.remove_column(last)
        aug_fields = aug_fields[:-1]
        base_idx = len(state_cols)
        if decision.fresh_rows_value == 0 and entry.advance_watermark(now_ns):
            pass  # merged state ≡ stored state: watermark swap only
        else:
            state_schema = StructType(
                [f for f in aug_fields[:base_idx]]
            )
            state_part = tbl.select(list(range(base_idx)))
            if not entry.put_arrow(now_ns, state_part, state_schema):
                st_df = self.spark.createDataFrame(
                    state_part, schema=state_schema
                )
                entry.put(now_ns, st_df, self.spark)
        decision.refresh_tier = "template"
        return self._arrow_result(
            tbl, aug_fields, base_idx, spec,
            tpl["out_names"], tpl["extra_names"], tpl["order_names"],
        )

    # -- dynamic-bound SQL-template warm path --------------------------------

    @staticmethod
    def _time_conds(
        q,
        ts_col: str,
        shadow_ok: bool,
        ts_is_ts: bool,
        part_col: Optional[str],
        p: str,
    ) -> List[str]:
        """Window conditions ``[lo, hi)`` with ``p``-prefixed placeholder
        tokens: exact on the epoch-ns shadow when present (plus redundant
        PUSHABLE µs bounds on the timestamp itself — floored lower, ceiled
        upper, so the superset never drops an admitted row), µs bounds
        otherwise, plus partition-column date bounds. The token twin of
        ``_push_time_bounds``."""
        conds = []
        if shadow_ok:
            shadow = q(f"{ts_col}_ns")
            if ts_is_ts:
                # µs-aligned bounds make the pushable µs comparisons exact;
                # the guard token then folds the per-row ns conds away
                # (see the static template's __QC_NSG__ note)
                conds.append(
                    f"(__QC_{p}NSG__ OR ({shadow} >= __QC_{p}LO_NS__ "
                    f"AND {shadow} < __QC_{p}HI_NS__))"
                )
                conds.append(f"{q(ts_col)} >= timestamp_micros(__QC_{p}LO_USF__)")
                conds.append(f"{q(ts_col)} < timestamp_micros(__QC_{p}HI_USC__)")
            else:
                conds.append(f"{shadow} >= __QC_{p}LO_NS__")
                conds.append(f"{shadow} < __QC_{p}HI_NS__")
        else:
            conds.append(f"{q(ts_col)} >= timestamp_micros(__QC_{p}LO_USC__)")
            conds.append(f"{q(ts_col)} < timestamp_micros(__QC_{p}HI_USC__)")
        if part_col:
            conds.append(f"{q(part_col)} >= DATE'__QC_{p}LO_D__'")
            conds.append(f"{q(part_col)} <= DATE'__QC_{p}HI_D__'")
        return conds

    @staticmethod
    def _sub_time_tokens(sql: str, p: str, lo_ns: int, hi_ns: int) -> str:
        import datetime as _dt

        # guard erasure also requires NON-NEGATIVE bounds: ns sources derive
        # µs ts via `div 1000`, which truncates toward zero — for pre-1970
        # (negative-epoch) values trunc != floor, so the "µs bounds are
        # exact" equivalence the guard relies on breaks below epoch 0
        aligned = lo_ns % 1000 == 0 and hi_ns % 1000 == 0 and lo_ns >= 0
        sql = sql.replace(f"__QC_{p}NSG__", "true" if aligned else "false")
        sql = sql.replace(f"__QC_{p}LO_NS__", str(lo_ns))
        sql = sql.replace(f"__QC_{p}HI_NS__", str(hi_ns))
        sql = sql.replace(f"__QC_{p}LO_USF__", str(lo_ns // 1000))
        sql = sql.replace(f"__QC_{p}LO_USC__", str(-(-lo_ns // 1000)))
        sql = sql.replace(f"__QC_{p}HI_USC__", str(-(-hi_ns // 1000)))
        if f"__QC_{p}LO_D__" in sql:
            epoch = _dt.datetime(1970, 1, 1)
            lo_d = (epoch + _dt.timedelta(microseconds=lo_ns // 1000)).date()
            hi_d = (epoch + _dt.timedelta(microseconds=hi_ns // 1000)).date()
            sql = sql.replace(f"__QC_{p}LO_D__", lo_d.isoformat())
            sql = sql.replace(f"__QC_{p}HI_D__", hi_d.isoformat())
        return sql

    def _dyn_warm_template(
        self,
        pkey,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
        bucket_name: str,
        bucket_gran: str,
        dyn_op: str,
    ) -> Optional[dict]:
        """Memoized one-SQL template for the dynamic-bound refresh."""
        key = ("dyn", pkey[0], pkey[1], state_schema.simpleString())
        if key in self._tpl_cache:
            return self._tpl_cache[key]
        tpl = None
        try:
            tpl = self._build_dyn_warm_template(
                fingerprint, spec, plans, state_group, group_names, state_cols,
                partial_aggs, merge_aggs, pred, ts_col, shadow_ok, part_col,
                state_schema, tables, bucket_name, bucket_gran, dyn_op,
            )
        except Exception as e:
            self.config.log.info(
                fingerprint,
                f"dyn sql-template not available ({e}); using classic plan",
            )
            tpl = None
        if tpl is not None:
            tpl["key"] = key
        self._tpl_cache[key] = tpl
        return tpl

    def _dyn_scan_core(
        self,
        core: dict,
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        bucket_name: str,
        bucket_gran: str,
        dyn_op: str,
    ) -> dict:
        """Combined fresh-tail + boundary-bucket scan, shared by the fused
        dyn template and the lite tier.

        ONE pass over the fact table replaces the former two scan branches
        (fresh tail [wm, now) and boundary-bucket recompute): the WHERE
        keeps a PUSHABLE OR-of-ranges conjunct — both ranges reach parquet
        row-group stats and partition pruning, so at scale the pruned set
        is exactly (fresh-tail partitions) ∪ (boundary-bucket partitions),
        the same I/O as two scans — plus the exact row conditions exposed
        as the ``qif``/``qib`` boolean columns.

        The bound, its bucket, and the bucket end are all EXPRESSIONS over
        the pinned-now rhs (token ``__QC_RHS__``, rendered per call):
        Catalyst constant-folds them to literals before pushdown/pruning,
        so no driver-side evaluation job runs per refresh.

        Pushdown invariant: the boundary side folds the dynamic comparison
        (``ts {op} rhs``) into its range's lower bound and — for
        calendar-exact bucket caps — drops the bucket-equality predicate
        entirely (the range [rhs, bucket_end) lies inside the boundary
        bucket by construction, so the equality is implied). That leaves
        the exact boundary conds ATOM-IDENTICAL to the pushable ones: the
        optimizer's distributive rewrite ``(A∨B)∧(A∨C) → A∨(B∧C)`` then
        yields a single all-translatable Or, and the OR-of-ranges reaches
        parquet PushedFilters. With an untranslatable leaf in the exact
        side (the sub-day slack / unknown-granularity cases keep the
        bucket equality), the same rewrite would fuse it into the Or and
        silently kill scan pushdown for BOTH ranges.
        """
        q = core["q"]
        g_sql = core["g_sql"]
        bucket_dt = core["dtypes"][bucket_name].simpleString()
        rhs = "__QC_RHS__"
        low_ts = f"CAST({rhs} AS TIMESTAMP)"
        bnd_trunc = f"date_trunc('{bucket_gran}', {rhs})"
        bnd_lit = f"CAST({bnd_trunc} AS {bucket_dt})"
        op = ">" if dyn_op == ">" else ">="
        iv = self._BUCKET_INTERVAL.get(bucket_gran.lower())
        if iv is not None:
            bend = f"CAST({bnd_trunc} + {iv} AS TIMESTAMP)"
            if bucket_gran.lower() in ("minute", "hour"):
                # sub-day buckets: widen the scan cap by 1h so a repeated
                # DST fall-back hour in a non-UTC session tz cannot drop
                # rows from the boundary recompute; the bucket-equality
                # predicate below keeps the result exact either way.
                # Day-and-coarser buckets get this from date_trunc+INTERVAL
                # calendar arithmetic directly.
                bend = f"{bend} + INTERVAL '1' HOUR"
            bend_us = f"unix_micros({bend})"
            bhi_ns = f"least(CAST(__QC_FHI_NS__ AS BIGINT), {bend_us} * 1000)"
            bhi_us = f"least(CAST(__QC_FHI_USC__ AS BIGINT), {bend_us})"
        else:
            bhi_ns = "__QC_FHI_NS__"
            bhi_us = "__QC_FHI_USC__"

        exact_cap = iv is not None and bucket_gran.lower() not in (
            "minute", "hour",
        )
        f_exact = self._time_conds(
            q, ts_col, shadow_ok, core["ts_is_ts"], None, "F"
        )
        b_exact: List[str] = []
        if shadow_ok:
            shadow = q(f"{ts_col}_ns")
            if core["ts_is_ts"]:
                # the lower ns bound (unix_micros * 1000) is µs-aligned by
                # construction; the upper is aligned whenever now is, so
                # the F-window guard token also erases these ns conds
                b_exact.append(
                    f"(__QC_FNSG__ OR ({shadow} >= unix_micros({low_ts}) "
                    f"* 1000 AND {shadow} < {bhi_ns}))"
                )
                b_exact.append(f"{q(ts_col)} {op} {low_ts}")
                b_exact.append(f"{q(ts_col)} < timestamp_micros({bhi_us})")
                push_f = (
                    f"({q(ts_col)} >= timestamp_micros(__QC_FLO_USF__) "
                    f"AND {q(ts_col)} < timestamp_micros(__QC_FHI_USC__))"
                )
                push_b = (
                    f"({q(ts_col)} {op} {low_ts} "
                    f"AND {q(ts_col)} < timestamp_micros({bhi_us}))"
                )
            else:
                b_exact.append(f"{shadow} >= unix_micros({low_ts}) * 1000")
                b_exact.append(f"{shadow} < {bhi_ns}")
                b_exact.append(f"{q(ts_col)} {op} {rhs}")
                push_f = (
                    f"({shadow} >= __QC_FLO_NS__ AND {shadow} < __QC_FHI_NS__)"
                )
                push_b = (
                    f"({shadow} >= unix_micros({low_ts}) * 1000 "
                    f"AND {shadow} < {bhi_ns})"
                )
        else:
            b_exact.append(f"{q(ts_col)} {op} {low_ts}")
            b_exact.append(f"{q(ts_col)} < timestamp_micros({bhi_us})")
            push_f = (
                f"({q(ts_col)} >= timestamp_micros(__QC_FLO_USC__) "
                f"AND {q(ts_col)} < timestamp_micros(__QC_FHI_USC__))"
            )
            push_b = (
                f"({q(ts_col)} {op} {low_ts} "
                f"AND {q(ts_col)} < timestamp_micros({bhi_us}))"
            )
        if not exact_cap:
            b_exact.append(f"{g_sql[bucket_name]} = {bnd_lit}")

        # inner subquery: pushable range filters + the two exact-range
        # booleans computed ONCE as columns (the SQL text and the per-row
        # work would otherwise repeat each range condition three times)
        in_fresh = "(" + " AND ".join(f_exact) + ")"
        in_bnd = "(" + " AND ".join(b_exact) + ")"
        inner_conds = [core["pred_sql"]] if core["pred_sql"] else []
        inner_conds.append(f"({push_f} OR {push_b})")
        if part_col:
            # partition-pruning disjunct: each range's date bounds, OR'd —
            # all leaves are plain comparisons, so the OR stays prunable
            inner_conds.append(
                f"(({q(part_col)} >= DATE'__QC_FLO_D__' AND "
                f"{q(part_col)} <= DATE'__QC_FHI_D__') OR "
                f"({q(part_col)} >= CAST({low_ts} AS DATE) AND "
                f"{q(part_col)} <= CAST(timestamp_micros({bhi_us}) AS DATE)))"
            )
        qif, qib = q("__qc_if"), q("__qc_ib")
        inner_sql = (
            f"SELECT *, {in_fresh} AS {qif}, {in_bnd} AS {qib} "
            f"FROM {core['from_sql']} WHERE {' AND '.join(inner_conds)}"
        )
        return {
            "rhs": rhs,
            "low_ts": low_ts,
            "bnd_lit": bnd_lit,
            "bucket_dt": bucket_dt,
            "qif": qif,
            "qib": qib,
            "inner_sql": inner_sql,
        }

    def _build_dyn_warm_template(
        self,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
        bucket_name: str,
        bucket_gran: str,
        dyn_op: str,
    ) -> Optional[dict]:
        """One-SQL / one-shuffle dynamic-bound refresh program.

        The classic dynamic warm path ran several driver-sequenced jobs per
        refresh (fresh-tail merge, state store, boundary recompute, final
        re-aggregate) — slower than a plain rescan at every recorded scale.
        This template computes BOTH the refreshed state (for the store-back)
        and the finished query result in ONE aggregate via a destination
        tag:

        * every input row is routed to ``dest=0`` (state maintenance, at
          bucket granularity) and/or ``dest=1`` (the query result, at the
          QUERY's granularity) — rows above the boundary bucket explode to
          both, boundary-bucket recompute rows go only to the result;
        * for result rows the synthetic bucket key is nulled out, so ONE
          ``GROUP BY dest, <state groups>`` aggregates each destination at
          its own granularity (merge associativity: re-aggregating merged
          full buckets ≡ merging their raw parts);
        * the whole program is one Spark job — ONE fact-table scan whose
          pushable OR-of-ranges filter covers both the fresh tail
          ``[wm, now)`` and the boundary bucket ``[lower, bucket_end)``
          (both ranges reach parquet ``PushedFilters`` / partition
          pruning), one tiny state-file scan, ONE shuffle — against
          plain's full-window rescan.

        ``bucket_end`` comes from a session-tz ``date_trunc + INTERVAL``,
        so the boundary scan needs no DST slack; bound and boundary
        literals bind as epoch-µs ``timestamp_micros`` tokens, so
        session-timezone string reinterpretation can't shift them. The
        driver splits the collected Arrow table on the kind column: kind=0
        rows feed ``put_arrow`` (no second scan), kind=1 rows finish as
        the LocalRelation result.
        """
        import hashlib

        core = self._tpl_core(
            spec, plans, state_group, group_names, state_cols, partial_aggs,
            merge_aggs, pred, ts_col, state_schema, tables,
        )
        if core is None:
            return None
        q = core["q"]
        g_sql = core["g_sql"]
        if bucket_name not in g_sql:
            return None  # no bucket column in state: not a dyn state shape

        rg = [g.name for g in spec.group_by]
        sc = self._dyn_scan_core(
            core, ts_col, shadow_ok, part_col, bucket_name, bucket_gran,
            dyn_op,
        )
        bucket_dt = sc["bucket_dt"]
        bnd_lit = sc["bnd_lit"]
        null_bucket = bucket_name not in rg  # synthetic bucket: result drops it
        dest = q("__qc_dest")
        isf = q("__qc_isfresh")
        view = f"__qc_state_{hashlib.md5(fingerprint.encode()).hexdigest()[:12]}"

        def dest_arr(bucket_expr: str) -> str:
            """Explode source: state-maintenance always; the result too for
            rows strictly above the boundary bucket (boundary-bucket rows
            reach the result via the exact recompute branch instead)."""
            return (
                f"LATERAL VIEW explode(CASE WHEN {bucket_expr} > {bnd_lit} "
                f"THEN array(0, 1) ELSE array(0) END) __qc_x AS {q('__qc_dest')}"
            )

        def bucket_out(bucket_expr: str, const_dest1: bool) -> str:
            if not null_bucket:
                return bucket_expr
            if const_dest1:
                return f"CAST(NULL AS {bucket_dt})"
            return (
                f"CASE WHEN {dest} = 1 THEN CAST(NULL AS {bucket_dt}) "
                f"ELSE {bucket_expr} END"
            )

        # state rows: one tiny scan, exploded to their destination set
        st_items = []
        for n in state_cols:
            if n == bucket_name:
                st_items.append(f"{bucket_out(q(n), False)} AS {q(n)}")
            else:
                st_items.append(q(n))
        state_branch = (
            f"SELECT {', '.join(st_items)}, {dest}, 0 AS {isf} "
            f"FROM {q(view)} {dest_arr(q(bucket_name))}"
        )

        qif, qib = sc["qif"], sc["qib"]
        inner_sql = sc["inner_sql"]

        def scan_items(const_dest1: bool) -> List[str]:
            out = []
            for s, n in zip(core["items"], state_cols):
                if n == bucket_name:
                    out.append(
                        f"{bucket_out(g_sql[n], const_dest1)} AS {q(n)}"
                    )
                else:
                    out.append(s)
            return out

        # destination routing: fresh rows always maintain state (0) and
        # additionally feed the result (1) when their bucket is strictly
        # above the boundary bucket OR they fall in the exact boundary
        # recompute range; boundary-only rows feed the result alone
        dest_case = (
            f"CASE WHEN {qif} AND ({g_sql[bucket_name]} > {bnd_lit} "
            f"OR {qib}) THEN array(0, 1) "
            f"WHEN {qif} THEN array(0) ELSE array(1) END"
        )
        scan_src = (
            f"({inner_sql}) __qc_s "
            f"LATERAL VIEW explode({dest_case}) __qc_x AS {q('__qc_dest')}"
        )
        scan_where = f"{qif} OR {qib}"
        if core["use_singleton"]:
            scan_branch = (
                f"SELECT {', '.join(scan_items(False))}, {dest}, "
                f"CASE WHEN {dest} = 0 THEN 1 ELSE 0 END AS {isf} "
                f"FROM {scan_src} WHERE {scan_where}"
            )
        else:
            gb = [f"{bucket_out(g_sql[n], False)}" if n == bucket_name
                  else g_sql[n] for n in group_names]
            scan_branch = (
                f"SELECT {', '.join(scan_items(False))}, {dest}, "
                f"sum(CASE WHEN {dest} = 0 THEN 1 ELSE 0 END) AS {isf} "
                f"FROM {scan_src} WHERE {scan_where}"
                f" GROUP BY {dest}, {', '.join(gb)}"
            )

        # ONE aggregate over the tagged union: dest=0 groups merge at state
        # (bucket) granularity, dest=1 groups at the query's granularity
        union_sql = f"{state_branch} UNION ALL {scan_branch}"
        m_sql = (
            f"SELECT {dest}, {core['sel_groups']}, "
            f"{', '.join(core['merge_items'])}, "
            f"sum({isf}) AS {q('__qc_fresh')} "
            f"FROM ({union_sql}) __qc_u "
            f"GROUP BY {dest}, {core['sel_groups']}"
        )

        # finalize: state columns ride through (kind=0 rows feed the
        # store-back; their fin columns are computed but ignored), fins
        # finish kind=1 rows — the layout _run_dyn_warm_template splits
        fin_items = [q(n) for n in state_cols]
        fin_items.extend(core["fin_exprs"])
        fin_items.append(q("__qc_fresh"))
        fin_items.append(f"{dest} AS {q('__qc_kind')}")
        sql = f"SELECT {', '.join(fin_items)} FROM ({m_sql}) __qc_m"

        if "lambdafunction(" in sql:
            return None  # same non-parseable-render guard as the static path

        return {
            "sql": sql,
            "view": view,
            "out_names": core["out_names"],
            "order_names": core["order_names"],
            "extra_names": core["extra_names"],
        }

    def _run_dyn_warm_template(
        self,
        tpl: dict,
        entry,
        cached_state: DataFrame,
        wm_ns: int,
        now_ns: int,
        dyn_rhs,
        decision: Decision,
        spec: AggSpec,
        state_cols: List[str],
    ) -> Optional[DataFrame]:
        """Execute the templated dynamic refresh: one Spark job, one Arrow
        collect, driver-side split into store-back state and result. The
        bound never evaluates on the driver — the pinned rhs is rendered
        into the SQL and Catalyst constant-folds it."""
        from pyspark.sql.types import StructType

        try:
            rhs_sql = f"({self._sql_of(to_column(self._pin_now(dyn_rhs, now_ns)))})"
            # the rendered pinned bound (classic paths carry the evaluated
            # value; evaluating here would cost a driver-local Spark job)
            decision.dynamic_lower = rhs_sql
            sql = tpl["sql"].replace("__QC_RHS__", rhs_sql)
            sql = self._sub_time_tokens(sql, "F", wm_ns, now_ns)
            sql = self._bind_state_source(tpl, entry, cached_state, sql)
            with self._refresh_confs():
                df = self.spark.sql(sql)
                self.last_refresh_df = df
                aug_fields = list(df.schema.fields)
                tbl = df.toArrow()  # the ONE job over the data
        except Exception as e:
            self._tpl_cache[tpl["key"]] = None
            self.config.log.warn(
                decision.fingerprint or "",
                f"dyn sql-template warm path failed ({e}); falling back",
            )
            return None

        import pyarrow.compute as pc

        kind = tbl.column(tbl.num_columns - 1)
        state_tbl = tbl.filter(pc.equal(kind, 0))
        res_tbl = tbl.filter(pc.equal(kind, 1))
        fresh = pc.sum(state_tbl.column(tbl.num_columns - 2)).as_py()
        decision.fresh_rows_value = int(fresh or 0)
        base_idx = len(state_cols)
        res_tbl = res_tbl.remove_column(res_tbl.num_columns - 1)
        res_tbl = res_tbl.remove_column(res_tbl.num_columns - 1)
        aug_res_fields = aug_fields[:-2]
        if decision.fresh_rows_value == 0 and entry.advance_watermark(now_ns):
            pass  # merged state ≡ stored state: watermark swap only
        else:
            state_schema = StructType([f for f in aug_fields[:base_idx]])
            state_part = state_tbl.select(list(range(base_idx)))
            if not entry.put_arrow(now_ns, state_part, state_schema):
                st_df = self.spark.createDataFrame(state_part, schema=state_schema)
                entry.put(now_ns, st_df, self.spark)
        decision.refresh_tier = "template"
        return self._arrow_result(
            res_tbl, aug_res_fields, base_idx, spec,
            tpl["out_names"], tpl["extra_names"], tpl["order_names"],
        )

    def _dyn_lite_template(
        self,
        pkey,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
        bucket_name: str,
        bucket_gran: str,
        dyn_op: str,
    ) -> Optional[dict]:
        """Memoized lite-tier program for the dynamic-bound refresh."""
        key = ("dynlite", pkey[0], pkey[1], state_schema.simpleString())
        if key in self._tpl_cache:
            return self._tpl_cache[key]
        tpl = None
        try:
            tpl = self._build_dyn_lite_template(
                fingerprint, spec, plans, state_group, group_names,
                state_cols, partial_aggs, merge_aggs, pred, ts_col,
                shadow_ok, part_col, state_schema, tables, bucket_name,
                bucket_gran, dyn_op,
            )
        except Exception as e:
            self.config.log.info(
                fingerprint,
                f"dyn lite tier not available ({e}); trying fused template",
            )
            tpl = None
        if tpl is not None:
            tpl["key"] = key
        self._tpl_cache[key] = tpl
        return tpl

    def _build_dyn_lite_template(
        self,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
        bucket_name: str,
        bucket_gran: str,
        dyn_op: str,
    ) -> Optional[dict]:
        """Lite dynamic-bound refresh: a PLAIN-SIZED Spark job plus an
        O(state) driver merge.

        The fused template's one-job program is still a 4-stage plan
        (state scan ∪ exploded fact scan → merge shuffle → finalize) whose
        per-refresh analyze+codegen fixed cost (~0.3 s) dwarfs plain's
        (~0.1 s) at small scale. When the query GROUPS BY its own time
        bucket, no cross-bucket merge is needed at all: the refreshed
        state rows ARE the result rows (plus the recomputed boundary
        bucket). So this tier runs ONLY the distributed part Spark is
        needed for — the fresh-tail + boundary scan with the same pushable
        OR-of-ranges filter, partially aggregated at (state groups ×
        disjoint range cell) — and folds the handful of returned partial
        rows into the driver-resident state with exact Python mirrors of
        the merge/finalize semantics (``partial.py py_merge/py_finalize``;
        the reference merges accumulator state in-engine the same way,
        ``src/aggregate.rs:402-409``). One scan, one small shuffle, a
        plan the size of plain's, and no second aggregate.

        Admission (anything else falls back to the fused template):
        * the bucket is one of the query's GROUP BY columns;
        * every aggregate + finalize shape has an exact Python mirror
          (count/sum/min/max/avg over non-decimal input; bare calls,
          ``+ - * /``, HALF_UP round);
        * no grouping sets; no float-typed or nested group keys
          (Python dict keys must hash like SQL equality);
        * no ltz timestamps in state/output (tz-free Arrow round-trip).

        At 100 TB the admission story is unchanged from the fused
        template: both tiers require driver-small state (the caller's
        ``state_is_local`` gate); the scan stays fully distributed with
        parquet pushdown/pruning, only O(state) rows cross the driver.
        """
        from pyspark.sql.types import DateType

        rg = [g.name for g in spec.group_by]
        if bucket_name not in rg:
            return None  # cross-bucket merge needed: fused template's job
        # dyn rejects ltz timestamps: the boundary compare / trunc
        # arithmetic driver-side assumes tz-free values (static lite allows
        # them — aware datetimes pass through as opaque keys there)
        base = self._lite_base(
            spec, plans, state_group, group_names, state_cols, partial_aggs,
            merge_aggs, pred, ts_col, state_schema, tables, allow_ltz=False,
        )
        if base is None:
            return None
        core = base.pop("__core")
        q = core["q"]

        sc = self._dyn_scan_core(
            core, ts_col, shadow_ok, part_col, bucket_name, bucket_gran,
            dyn_op,
        )
        qif, qib = sc["qif"], sc["qib"]

        # disjoint range cells — no row is double-counted: 2 = fresh tail
        # only, 1 = boundary recompute only, 3 = both. Driver folds
        # {2,3} into the state update and {1,3} into the boundary result.
        cell = f"(CASE WHEN {qif} AND {qib} THEN 3 WHEN {qif} THEN 2 ELSE 1 END)"
        base["sql"] = (
            f"SELECT {', '.join(base.pop('__items'))}, "
            f"count(1) AS {q('__qc_nr')}, "
            f"any_value({sc['bnd_lit']}) AS {q('__qc_bnd')}, "
            f"{cell} AS {q('__qc_cell')} "
            f"FROM ({sc['inner_sql']}) __qc_s WHERE {qif} OR {qib} "
            f"GROUP BY {core['gb_exprs']}, {cell}"
        )
        st_fields = {f.name: f.dataType for f in state_schema.fields}
        base["bucket_idx"] = group_names.index(bucket_name)
        base["bucket_gran"] = bucket_gran
        base["bucket_is_date"] = isinstance(st_fields[bucket_name], DateType)
        return base

    def _lite_base(
        self,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        state_schema,
        tables: List[str],
        allow_ltz: bool,
    ) -> Optional[dict]:
        """Shared driver-merge scaffolding of the lite/nano tiers: the
        Python merge program, the partial select items, and the
        output/state Arrow schemas (a zero-row schema probe — analysis
        only, no job). None ⇔ some shape has no exact Python mirror."""
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            FloatType,
            MapType,
            StructType,
            TimestampType,
        )

        from .functions.partial import lite_plan

        if spec.grouping_sets:
            return None
        lp = lite_plan(plans)
        if lp is None:
            return None
        core = self._tpl_core(
            spec, plans, state_group, group_names, state_cols, partial_aggs,
            merge_aggs, pred, ts_col, state_schema, tables,
        )
        if core is None:
            return None
        q = core["q"]
        g_sql = core["g_sql"]
        sql_of = self._sql_of

        st_fields = {f.name: f.dataType for f in state_schema.fields}
        for g in group_names:
            dt = st_fields[g]
            if isinstance(dt, (FloatType, DoubleType, ArrayType, MapType,
                               StructType)):
                return None  # Python-key hashing differs from SQL equality
        if not allow_ltz:
            for f in state_schema.fields:
                if isinstance(f.dataType, TimestampType):
                    return None  # ltz: tz-dependent driver arithmetic

        partial_cols = [n for n in state_cols if n not in g_sql]
        items = [f"{g_sql[n]} AS {q(n)}" for n in group_names]
        items += [f"{sql_of(partial_aggs[n])} AS {q(n)}" for n in partial_cols]

        # output dtypes via a zero-row schema probe (analysis only, no job)
        st0 = self.spark.createDataFrame([], state_schema)
        merged0 = st0.groupBy(*[F.col(n) for n in group_names]).agg(
            *[c.alias(n) for n, c in merge_aggs.items()]
        )
        fin_by = {p.name: p.finalize for p in plans}
        out_names = core["out_names"]
        extra_names = core["extra_names"]
        res_names = out_names + extra_names
        out0 = merged0.select(
            *[fin_by[nm] if nm in fin_by else F.col(nm) for nm in res_names]
        )
        out_fields = list(out0.schema.fields)
        if not allow_ltz:
            for f in out_fields:
                if isinstance(f.dataType, TimestampType):
                    return None
        out_arrow = to_arrow_schema(StructType(out_fields))
        state_arrow = to_arrow_schema(state_schema)

        return {
            "__core": core,
            "__items": items,
            "group_names": group_names,
            "partial_cols": partial_cols,
            "merges": lp["merges"],
            "fins": lp["fins"],
            "out_names": out_names,
            "extra_names": extra_names,
            "order_names": core["order_names"],
            "res_names": res_names,
            "name_to_group": {g: i for i, g in enumerate(group_names)},
            "out_fields": out_fields,
            "out_arrow": out_arrow,
            "state_arrow": state_arrow,
            "state_schema": state_schema,
        }

    def _run_dyn_lite(
        self,
        tpl: dict,
        entry,
        cached_state: DataFrame,
        wm_ns: int,
        now_ns: int,
        dyn_rhs,
        decision: Decision,
        spec: AggSpec,
    ) -> Optional[DataFrame]:
        """Execute the lite refresh: one plain-sized Spark job, then the
        O(state) merge/finalize on the driver. Store-back happens only
        after the result is safely built — a store failure leaves the old
        state + watermark intact (the next refresh rescans from the old
        watermark, exactly)."""
        import datetime as _dt

        try:
            rhs_sql = f"({self._sql_of(to_column(self._pin_now(dyn_rhs, now_ns)))})"
            decision.dynamic_lower = rhs_sql
            sql = tpl["sql"].replace("__QC_RHS__", rhs_sql)
            sql = self._sub_time_tokens(sql, "F", wm_ns, now_ns)
            with self._refresh_confs():
                df = self.spark.sql(sql)
                self.last_refresh_df = df
                scan = df.toArrow().to_pylist()

            state = self._load_driver_state(tpl, entry, cached_state)
            gnames = tpl["group_names"]
            pcols = tpl["partial_cols"]
            merges = tpl["merges"]

            def merge2(a, b):
                if a is None:
                    return dict(b)
                out = dict(a)
                for m in merges:
                    out.update(m(a, b))
                return out

            fresh: dict = {}
            bnd: dict = {}
            boundary = None
            fresh_rows = 0
            for r in scan:
                key = tuple(r[g] for g in gnames)
                st = {c: r[c] for c in pcols}
                boundary = r["__qc_bnd"]
                if r["__qc_cell"] >= 2:  # cells 2, 3: fresh tail
                    fresh[key] = merge2(fresh.get(key), st)
                    fresh_rows += r["__qc_nr"]
                if r["__qc_cell"] in (1, 3):  # boundary recompute
                    bnd[key] = merge2(bnd.get(key), st)
            decision.fresh_rows_value = int(fresh_rows)

            if boundary is None:
                # zero admitted rows: evaluate the boundary bucket directly
                ev = self._eval_bound_and_bucket(
                    dyn_rhs, now_ns, tpl["bucket_gran"]
                )
                boundary = ev[1]
                if tpl["bucket_is_date"] and isinstance(boundary, _dt.datetime):
                    boundary = boundary.date()

            res = self._finish_dyn_driver(
                tpl, entry, now_ns, decision, spec, state, fresh, bnd,
                boundary,
            )
            decision.refresh_tier = "lite"
            return res
        except StateCardinalityExceeded:
            raise  # cap trip: sql() registers the denial (cap contract)
        except Exception as e:
            self._tpl_cache[tpl["key"]] = None
            self.config.log.warn(
                decision.fingerprint or "",
                f"dyn lite warm path failed ({e}); falling back",
            )
            return None

    def _load_driver_state(self, tpl: dict, entry, cached_state: DataFrame):
        """Current state rows as {group key tuple: {state col: value}}."""
        st_tbl = entry.get_arrow()
        if st_tbl is None:
            st_tbl = cached_state.toArrow()
        gnames = tpl["group_names"]
        pcols = tpl["partial_cols"]
        return {
            tuple(r[g] for g in gnames): {c: r[c] for c in pcols}
            for r in st_tbl.to_pylist()
        }

    def _finish_dyn_driver(
        self,
        tpl: dict,
        entry,
        now_ns: int,
        decision: Decision,
        spec: AggSpec,
        state: dict,
        fresh: dict,
        bnd: dict,
        boundary,
    ) -> DataFrame:
        """Shared driver tail of the nano and lite tiers: fold the fresh
        partials into the state, finalize the result rows (full buckets
        above the boundary from the refreshed state + the recomputed
        boundary bucket), and store back. Store-back runs only after the
        result is safely built — a store failure leaves the old state +
        watermark intact (the next refresh rescans from the old
        watermark, exactly)."""
        import pyarrow as pa

        gnames = tpl["group_names"]
        merges = tpl["merges"]

        def merge2(a, b):
            if a is None:
                return dict(b)
            out = dict(a)
            for m in merges:
                out.update(m(a, b))
            return out

        new_state = dict(state)
        for k, st in fresh.items():
            new_state[k] = merge2(new_state.get(k), st)

        fins = tpl["fins"]
        n2g = tpl["name_to_group"]
        # HAVING applies at result granularity: the Python mirror filters
        # finalized rows (SQL keeps only TRUE; UNKNOWN/FALSE drop)
        having = fins.get("__qc_having")

        def keep(st):
            return having is None or having(st) is True

        def mk_row(key, st):
            return {
                nm: key[n2g[nm]] if nm in n2g else fins[nm](st)
                for nm in tpl["res_names"]
            }

        if boundary is None:
            # static window: the refreshed state IS the result
            rows = [
                mk_row(k, st) for k, st in new_state.items() if keep(st)
            ]
        else:
            bidx = tpl["bucket_idx"]
            rows = [
                mk_row(k, st)
                for k, st in new_state.items()
                if k[bidx] is not None and k[bidx] > boundary and keep(st)
            ]
            rows.extend(
                mk_row(k, st) for k, st in bnd.items() if keep(st)
            )
        res_tbl = pa.Table.from_pylist(rows, schema=tpl["out_arrow"])
        # having already applied above: hand _arrow_result a having-free
        # spec so it doesn't treat the last column as a filter flag
        import dataclasses as _dc

        fin_spec = (
            _dc.replace(spec, having=None) if spec.having is not None else spec
        )
        res = self._arrow_result(
            res_tbl, tpl["out_fields"], 0, fin_spec,
            tpl["out_names"], tpl["extra_names"], tpl["order_names"],
        )

        try:
            if fresh or not entry.advance_watermark(now_ns):
                state_rows = []
                for k, st in new_state.items():
                    d = {g: k[i] for i, g in enumerate(gnames)}
                    d.update(st)
                    state_rows.append(d)
                stt = pa.Table.from_pylist(
                    state_rows, schema=tpl["state_arrow"]
                )
                entry.put_arrow(now_ns, stt, tpl["state_schema"])
        except StateCardinalityExceeded:
            # cap trip must surface: sql() registers the session denial
            # and degrades the query to passthrough, per the cap contract
            raise
        except Exception as e:
            self.config.log.warn(
                decision.fingerprint or "",
                f"dyn driver store-back failed ({e}); "
                "state/watermark unchanged",
            )
        return res

    def _dyn_nano_template(
        self,
        pkey,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
        bucket_name: str,
        bucket_gran: str,
        dyn_op: str,
        dyn_rhs,
        pred_expr=None,
    ) -> Optional[dict]:
        """Memoized nano-tier program: the lite tier's driver merge plus a
        bytes-gated pyarrow scan replacing the Spark job (``nano.py``).
        Simple residual predicates ride as exact pyarrow mask mirrors."""
        key = ("dynnano", pkey[0], pkey[1], state_schema.simpleString())
        if not self._nano_tz_ok(fingerprint):
            return None  # bypass (memo untouched: resumes if tz → UTC)
        if key in self._tpl_cache:
            return self._tpl_cache[key]
        tpl = None
        try:
            ltpl = self._dyn_lite_template(
                pkey, fingerprint, spec, plans, state_group, group_names,
                state_cols, partial_aggs, merge_aggs, pred, ts_col,
                shadow_ok, part_col, state_schema, tables, bucket_name,
                bucket_gran, dyn_op,
            )
            if ltpl is None:
                raise Unsupported("lite driver-merge base unavailable")
            from .nano import build_nano_program

            prog = build_nano_program(
                tables[0], ts_col, state_group, plans, bucket_name,
                bucket_gran, dyn_op, dyn_rhs, ltpl["bucket_is_date"],
                self.config.nano_refresh_max_bytes, pred_expr=pred_expr,
                join_steps=spec.join_steps,
            )
            tpl = dict(ltpl)
            tpl["nano"] = prog
            tpl["table"] = tables[0]
        except Exception as e:
            self.config.log.info(
                fingerprint,
                f"dyn nano tier not available ({e}); trying lite/template",
            )
            tpl = None
        if tpl is not None:
            tpl["key"] = key
        self._tpl_cache[key] = tpl
        return tpl

    def _nano_tz_ok(self, fingerprint: str) -> bool:
        """The nano programs evaluate date_trunc buckets and window bounds
        with UTC Python/pyarrow mirrors, so they require a UTC session
        timezone at RUN time, not just when the memoized program was
        built. Checked on every refresh (template builders run before the
        memo lookup): a later ``SET spark.sql.session.timeZone`` bypasses
        the tier — the view-resolving tiers serve correctly — and the
        untouched memo resumes serving if the timezone returns to UTC."""
        tz = self.spark.conf.get("spark.sql.session.timeZone", "")
        if tz == "UTC":
            return True
        self.config.log.info(
            fingerprint,
            f"nano tier bypassed: session timezone {tz!r} (needs UTC)",
        )
        return False

    def _run_dyn_nano(
        self,
        tpl: dict,
        entry,
        cached_state: DataFrame,
        wm_ns: int,
        now_ns: int,
        dyn_rhs,
        decision: Decision,
        spec: AggSpec,
    ) -> Optional[DataFrame]:
        """Execute the nano refresh: NO Spark job — a pyarrow row-group-
        pruned scan of the bytes-gated local source, vectorized partial
        aggregation, and the shared driver merge/finalize/store tail."""
        import datetime as _dt

        try:
            tpl["nano"].validate(tpl["table"])
        except Exception as e:
            # source drifted: drop the memo so the NEXT refresh rebuilds
            # against the current files; this one takes the lite/template
            # tiers, which resolve the view per call
            self._tpl_cache.pop(tpl["key"], None)
            self.config.log.info(
                decision.fingerprint or "",
                f"dyn nano program stale ({e}); rebuilding next refresh",
            )
            return None
        try:
            state = self._load_driver_state(tpl, entry, cached_state)

            def jvm_eval():
                v = self._eval_bound_value(dyn_rhs, now_ns)
                if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                    return _dt.datetime(v.year, v.month, v.day)
                return v

            fresh, bnd, boundary, fresh_rows, bound_v = tpl["nano"].run(
                wm_ns, now_ns, jvm_eval=jvm_eval
            )
            decision.dynamic_lower = bound_v
            decision.fresh_rows_value = int(fresh_rows)
            res = self._finish_dyn_driver(
                tpl, entry, now_ns, decision, spec, state, fresh, bnd,
                boundary,
            )
            decision.refresh_tier = "nano"
            return res
        except StateCardinalityExceeded:
            raise  # cap trip: sql() registers the denial (cap contract)
        except Exception as e:
            self._tpl_cache[tpl["key"]] = None
            self.config.log.warn(
                decision.fingerprint or "",
                f"dyn nano warm path failed ({e}); falling back",
            )
            return None

    def _static_lite_template(
        self,
        pkey,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
    ) -> Optional[dict]:
        """Memoized STATIC lite-tier program.

        Static warm refreshes are strictly simpler than dynamic ones —
        the state granularity IS the query granularity and there is no
        boundary bucket — so when every aggregate/finalize has an exact
        Python mirror the whole refresh collapses to: ONE plain-sized
        Spark job (fresh-window scan + partial aggregation, the same
        pushable watermark conds as the fused template), a driver-side
        O(state) merge, and finalize over ALL refreshed state rows. This
        removes the fused template's state-scan ∪ union ∪ merge-shuffle
        plan — roughly halving the per-refresh JVM compile+run floor —
        for the most common dashboard shapes (any groups incl. ltz time
        buckets, predicates, joins, expression agg args; the partial agg
        stays in SQL so only MERGE/FINALIZE need Python mirrors).
        """
        key = ("slite", pkey[0], pkey[1], state_schema.simpleString())
        if key in self._tpl_cache:
            return self._tpl_cache[key]
        tpl = None
        try:
            base = self._lite_base(
                spec, plans, state_group, group_names, state_cols,
                partial_aggs, merge_aggs, pred, ts_col, state_schema,
                tables, allow_ltz=True,
            )
            if base is not None:
                core = base.pop("__core")
                q = core["q"]
                conds = list(
                    self._time_conds(
                        q, ts_col, shadow_ok, core["ts_is_ts"], part_col, "F"
                    )
                )
                if core["pred_sql"]:
                    conds.insert(0, core["pred_sql"])
                base["sql"] = (
                    f"SELECT {', '.join(base.pop('__items'))}, "
                    f"count(1) AS {q('__qc_nr')} "
                    f"FROM {core['from_sql']} WHERE {' AND '.join(conds)}"
                    # global aggregate: no GROUP BY clause (an empty
                    # expression list would be a ParseException that
                    # permanently nulls this memo — a silent tier loss)
                    + (f" GROUP BY {core['gb_exprs']}" if group_names else "")
                )
                tpl = base
        except Exception as e:
            self.config.log.info(
                fingerprint,
                f"static lite tier not available ({e}); using template",
            )
            tpl = None
        if tpl is not None:
            tpl["key"] = key
        self._tpl_cache[key] = tpl
        return tpl

    def _static_nano_template(
        self,
        pkey,
        fingerprint: str,
        spec: AggSpec,
        plans,
        state_group,
        group_names: List[str],
        state_cols: List[str],
        partial_aggs: Dict[str, Column],
        merge_aggs: Dict[str, Column],
        pred: Optional[Column],
        pred_expr,
        ts_col: str,
        shadow_ok: bool,
        part_col: Optional[str],
        state_schema,
        tables: List[str],
    ) -> Optional[dict]:
        """Memoized STATIC nano-tier program: the static lite driver merge
        with the Spark job replaced by a bytes-gated pyarrow scan of the
        fresh window. Beyond the dynamic nano contract it admits simple
        residual predicates (conjunctions of column-vs-literal
        comparisons, IS [NOT] NULL — mirrored exactly by pyarrow masks)
        and ltz time-bucket groups (UTC session gate: the aware instants
        equal the naive UTC floor)."""
        key = ("snano", pkey[0], pkey[1], state_schema.simpleString())
        if not self._nano_tz_ok(fingerprint):
            return None  # bypass (memo untouched: resumes if tz → UTC)
        if key in self._tpl_cache:
            return self._tpl_cache[key]
        tpl = None
        try:
            sltpl = self._static_lite_template(
                pkey, fingerprint, spec, plans, state_group, group_names,
                state_cols, partial_aggs, merge_aggs, pred, ts_col,
                shadow_ok, part_col, state_schema, tables,
            )
            if sltpl is None:
                raise Unsupported("static lite driver-merge base unavailable")
            from pyspark.sql.types import TimestampType

            from .nano import build_nano_program

            group_ltz = {
                f.name
                for f in state_schema.fields
                if f.name in group_names
                and isinstance(f.dataType, TimestampType)
            }
            prog = build_nano_program(
                tables[0], ts_col, state_group, plans, None, None, ">",
                None, False, self.config.nano_refresh_max_bytes,
                pred_expr=pred_expr, group_ltz=group_ltz, static=True,
                join_steps=spec.join_steps,
            )
            tpl = dict(sltpl)
            tpl["nano"] = prog
            tpl["table"] = tables[0]
        except Exception as e:
            self.config.log.info(
                fingerprint,
                f"static nano tier not available ({e}); trying lite/template",
            )
            tpl = None
        if tpl is not None:
            tpl["key"] = key
        self._tpl_cache[key] = tpl
        return tpl

    def _run_static_nano(
        self,
        tpl: dict,
        entry,
        cached_state: DataFrame,
        wm_ns: int,
        now_ns: int,
        decision: Decision,
        spec: AggSpec,
    ) -> Optional[DataFrame]:
        """Execute the static nano refresh: NO Spark job — pyarrow scan of
        the fresh window, vectorized partials, shared driver merge."""
        try:
            tpl["nano"].validate(tpl["table"])
        except Exception as e:
            # source drifted: drop the memo so the NEXT refresh rebuilds
            self._tpl_cache.pop(tpl["key"], None)
            self.config.log.info(
                decision.fingerprint or "",
                f"static nano program stale ({e}); rebuilding next refresh",
            )
            return None
        try:
            state = self._load_driver_state(tpl, entry, cached_state)
            fresh, _bnd, _boundary, fresh_rows, _bound = tpl["nano"].run(
                wm_ns, now_ns
            )
            decision.fresh_rows_value = int(fresh_rows)
            res = self._finish_dyn_driver(
                tpl, entry, now_ns, decision, spec, state, fresh, {}, None,
            )
            decision.refresh_tier = "nano"
            return res
        except StateCardinalityExceeded:
            raise  # cap trip: sql() registers the denial (cap contract)
        except Exception as e:
            self._tpl_cache[tpl["key"]] = None
            self.config.log.warn(
                decision.fingerprint or "",
                f"static nano warm path failed ({e}); falling back",
            )
            return None

    def _run_static_lite(
        self,
        tpl: dict,
        entry,
        cached_state: DataFrame,
        wm_ns: int,
        now_ns: int,
        decision: Decision,
        spec: AggSpec,
    ) -> Optional[DataFrame]:
        """Execute the static lite refresh: one plain-sized Spark job over
        the fresh window, driver merge, finalize over the whole state."""
        try:
            sql = self._sub_time_tokens(tpl["sql"], "F", wm_ns, now_ns)
            with self._refresh_confs():
                df = self.spark.sql(sql)
                self.last_refresh_df = df
                scan = df.toArrow().to_pylist()

            state = self._load_driver_state(tpl, entry, cached_state)
            gnames = tpl["group_names"]
            pcols = tpl["partial_cols"]
            merges = tpl["merges"]

            def merge2(a, b):
                if a is None:
                    return dict(b)
                out = dict(a)
                for m in merges:
                    out.update(m(a, b))
                return out

            fresh: dict = {}
            fresh_rows = 0
            for r in scan:
                key = tuple(r[g] for g in gnames)
                st = {c: r[c] for c in pcols}
                fresh[key] = merge2(fresh.get(key), st)
                fresh_rows += r["__qc_nr"]
            decision.fresh_rows_value = int(fresh_rows)

            res = self._finish_dyn_driver(
                tpl, entry, now_ns, decision, spec, state, fresh, {}, None,
            )
            decision.refresh_tier = "lite"
            return res
        except StateCardinalityExceeded:
            raise  # cap trip: sql() registers the denial (cap contract)
        except Exception as e:
            self._tpl_cache[tpl["key"]] = None
            self.config.log.warn(
                decision.fingerprint or "",
                f"static lite warm path failed ({e}); falling back",
            )
            return None

    def _apply_order_limit(self, out: DataFrame, spec: AggSpec) -> DataFrame:
        if spec.order_by:
            sort_cols = []
            for o in spec.order_by:
                name = self._resolve_order_name(o.expr, spec)
                sort_cols.append(_order_col(name, o))
            out = out.orderBy(*sort_cols)
        if spec.limit is not None:
            out = out.limit(spec.limit)
        return out

    @staticmethod
    def _resolve_order_name(e, spec: AggSpec) -> str:
        if isinstance(e, Lit) and isinstance(e.value, int):
            idx = e.value - 1
            if 0 <= idx < len(spec.select_order):
                return spec.select_order[idx]
            raise Unsupported("order-by position out of range")
        if isinstance(e, Col):
            if e.name in spec.select_order:
                return e.name
            raise Unsupported(f"order by non-output column {e.name}")
        for item in list(spec.group_by) + list(spec.aggregates):
            if item.expr == e:
                return item.name
        raise Unsupported("order by expression not in select list")

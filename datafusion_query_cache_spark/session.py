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
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .cache import CacheEntry
from .config import QueryCacheConfig
from .functions.compile import to_column
from .functions.partial import ItemPlan, NotDecomposable, plan_items
from .plans.classify import Verdict, classify, find_temporal_group_by
from .plans.ir import AggSpec, Col, Lit, Unsupported
from .plans.parser import parse_agg_query


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
    observation: Optional[Observation] = None  # fresh-scan row count (hit only)

    def fresh_rows(self) -> Optional[int]:
        """Rows scanned by the incremental refresh (the reference's
        ``EXPLAIN ANALYZE`` row-count oracle, ``examples/demo.rs:52-63``).
        None when unavailable."""
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

    # -- public API ---------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Run ``query``; transparently incremental when cache-eligible."""
        try:
            df, decision = self._plan_cached(query)
        except (Unsupported, NotDecomposable) as e:
            decision = Decision(sql=query, cached=False, reason=str(e))
            self.config.log.info("-", f"not cacheable: {e}")
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

    def _plan_cached(self, query: str):
        cfg = self.config
        spec = parse_agg_query(query)

        if spec.having is not None:
            raise Unsupported("HAVING not cacheable yet")

        cls = classify(spec.predicate, cfg.temporal_columns)
        if cls.verdict is Verdict.ABANDON:
            raise Unsupported(f"predicate not stable: {cls.reason}")
        if cls.verdict in (Verdict.FOUND, Verdict.FOUND_NOW):
            # The reference hard-errors on dynamic lower bounds
            # (``src/aggregate.rs:191-193``); we degrade to passthrough.
            raise Unsupported("dynamic lower bound not yet supported")

        tgb, ok = find_temporal_group_by(
            spec.group_by, cfg.temporal_columns, cfg.group_by_functions
        )
        if not ok:
            raise Unsupported("more than one temporal group-by bucket")

        ts_col = tgb.column if tgb else cfg.default_temporal_column
        base = self.spark.table(spec.table)
        if ts_col not in base.columns:
            raise Unsupported(f"temporal column {ts_col} not in table {spec.table}")

        plans = plan_items(spec.aggregates)

        # fingerprint = canonical IR + resolved source schema — the analogue
        # of plan.display_indent_schema() (``src/aggregate.rs:89``): schema
        # participates so a schema change invalidates the entry.
        fingerprint = f"{spec.canon()}|ts={ts_col}|schema={base.schema.simpleString()}"

        now_ns = self._now_ns()
        entry = cfg.cache.entry(fingerprint)

        group_partial = [to_column(g.expr).alias(g.name) for g in spec.group_by]
        group_names = [g.name for g in spec.group_by]
        partial_aggs: Dict[str, Column] = {}
        merge_aggs: Dict[str, Column] = {}
        for p in plans:
            partial_aggs.update(p.partial)
            merge_aggs.update(p.merge)
        state_cols = group_names + list(partial_aggs.keys())

        pred = to_column(spec.predicate) if spec.predicate is not None else None

        decision = Decision(
            sql=query, cached=True, fingerprint=fingerprint, now_ns=now_ns
        )

        def partial_agg(df: DataFrame) -> DataFrame:
            return df.groupBy(*group_partial).agg(
                *[c.alias(n) for n, c in partial_aggs.items()]
            )

        hit = entry.occupied
        if hit:
            try:
                cached_state = entry.get(self.spark)
                if set(cached_state.columns) != set(state_cols):
                    # schema contract violated (engine upgrade / hash
                    # collision): recompute rather than corrupt results.
                    cfg.log.warn(
                        fingerprint, "cached state schema mismatch; recomputing"
                    )
                    hit = False
            except Exception as e:  # unreadable state → self-heal as a miss
                cfg.log.warn(fingerprint, f"cached state unreadable ({e}); recomputing")
                hit = False

        if hit:
            wm_ns = entry.watermark_ns
            fresh = base
            if pred is not None:
                fresh = fresh.filter(pred)
            shadow = f"{ts_col}_ns"
            if shadow in base.columns:
                # raw epoch-ns shadow column (sources/tables.py): an exact
                # ns-precision bound AND a plain attribute comparison, so it
                # pushes down into the parquet scan for row-group pruning.
                fresh = fresh.filter(F.col(shadow) >= F.lit(wm_ns))
            else:
                # ns → µs for Spark TimestampType; ceil so the fresh window
                # never widens past the watermark (reference converts between
                # Arrow time units the same way, ``src/aggregate.rs:431-439``;
                # strictness per SURVEY §4.4.1).
                wm_us = -(-wm_ns // 1000)
                fresh = fresh.filter(
                    F.col(ts_col) >= F.timestamp_micros(F.lit(wm_us))
                )
            self._obs_counter += 1
            obs = Observation(f"qc_fresh_{self._obs_counter}")
            fresh = fresh.observe(obs, F.count(F.lit(1)).alias("rows"))
            # Singleton-state path (one shuffle): project each fresh row to a
            # one-row partial state and let the merge aggregate's map-side
            # combine do the partial aggregation — the Spark-native form of
            # the reference's Final(Union(Cached, Partial(fresh))) plan.
            # Falls back to an explicit partial aggregate (two shuffles) for
            # aggregates with no singleton form (e.g. HLL sketches).
            singletons: Dict[str, Column] = {}
            use_singleton = True
            for p in plans:
                if p.singleton is None:
                    use_singleton = False
                    break
                singletons.update(p.singleton)
            if use_singleton:
                dtypes = {f.name: f.dataType for f in cached_state.schema.fields}
                fresh_state = fresh.select(
                    *[
                        to_column(g.expr).cast(dtypes[g.name]).alias(g.name)
                        for g in spec.group_by
                    ],
                    *[
                        c.cast(dtypes[n]).alias(n)
                        for n, c in singletons.items()
                    ],
                )
            else:
                fresh_state = partial_agg(fresh)
            unioned = cached_state.unionByName(fresh_state)
            merged = unioned.groupBy(*[F.col(n) for n in group_names]).agg(
                *[c.alias(n) for n, c in merge_aggs.items()]
            )
            decision.cache_hit = True
            decision.watermark_ns = wm_ns
            decision.observation = obs
            cfg.log.info(
                fingerprint, f"cache hit: incremental refresh from watermark {wm_ns}"
            )
        else:
            df = base if pred is None else base.filter(pred)
            merged = partial_agg(df)
            cfg.log.info(fingerprint, "cache miss: computing and storing state")

        # store-back (reference always wraps in CacheUpdateAggregateExec so
        # run 1 populates and run N refreshes, ``src/aggregate.rs:399``); we
        # store *merged* (compacted) state — SURVEY §3.3 improvement — and
        # finalize from the stored copy so the source is scanned exactly once.
        stored = entry.put(now_ns, merged, self.spark)

        final_select: List[Column] = []
        fin_by_name = {p.name: p.finalize for p in plans}
        for name in spec.select_order:
            if name in fin_by_name:
                final_select.append(fin_by_name[name])
            else:
                final_select.append(F.col(name))
        out = stored.select(*final_select)

        out = self._apply_order_limit(out, spec)
        return out, decision

    def _apply_order_limit(self, out: DataFrame, spec: AggSpec) -> DataFrame:
        if spec.order_by:
            sort_cols = []
            for o in spec.order_by:
                name = self._resolve_order_name(o.expr, spec)
                c = F.col(name)
                c = c.desc() if o.desc else c.asc()
                sort_cols.append(c)
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

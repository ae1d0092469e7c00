"""Mini-IR → PySpark ``Column`` compiler.

The reference hands its (lightly rewritten) logical plan back to DataFusion's
physical planner (``src/lib.rs:89-117``).  Our equivalent of "physical
planning" is building a DataFrame program: every IR expression becomes a
``pyspark.sql.functions`` Column so the whole query stays JVM-side inside
whole-stage codegen — no Python UDFs anywhere in the cache path.
"""

from __future__ import annotations

import re
from typing import Callable, Dict

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.ir import (
    AggCall,
    BinOp,
    Case,
    Cast,
    Col,
    Expr,
    Func,
    InList,
    IsNull,
    Lit,
    Neg,
    Not,
    Star,
    Unsupported,
)

# duckdb logical type id → spark sql type name
_TYPE_MAP = {
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "DATE": "date",
    "DOUBLE": "double",
    "FLOAT": "float",
    "DECIMAL": "decimal(38,9)",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "bigint",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "INTERVAL": "interval",
}


_DECIMAL_RE = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")


def spark_type_for(duck_type: str) -> str:
    m = _DECIMAL_RE.match(duck_type.upper())
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    t = _TYPE_MAP.get(duck_type.upper())
    if t is None:
        raise Unsupported(f"cast to {duck_type}")
    return t


def _fn_direct(name: str) -> Callable[..., Column]:
    fn = getattr(F, name)
    return lambda *args: fn(*args)


def _date_part(*a) -> Column:
    # only the two-arg scalar-field form compiles; duckdb's list-of-parts
    # form date_part(['year','month'], ts) and any other arity degrade to
    # passthrough via Unsupported instead of a TypeError (which would take
    # the unexpected-error path and raise under strict_errors).
    if len(a) != 2 or not isinstance(a[0], str) or not isinstance(a[1], Column):
        raise Unsupported("date_part: only date_part('field', ts) compiles")
    return F.date_part(F.lit(a[0]), a[1])


# duckdb function name → builder(args...) -> Column.  Only deterministic
# scalars — the classifier guarantees volatile fns never reach compilation
# on the cached path; passthrough queries never reach this compiler at all.
_FUNCS: Dict[str, Callable[..., Column]] = {
    "date_trunc": lambda g, ts: F.date_trunc(g, ts),
    "round": lambda *a: F.round(*a),
    "floor": lambda c: F.floor(c),
    "ceil": lambda c: F.ceil(c),
    "ceiling": lambda c: F.ceil(c),
    "abs": lambda c: F.abs(c),
    "upper": _fn_direct("upper"),
    "lower": _fn_direct("lower"),
    "length": _fn_direct("length"),
    "trim": _fn_direct("trim"),
    "ltrim": _fn_direct("ltrim"),
    "rtrim": _fn_direct("rtrim"),
    "coalesce": _fn_direct("coalesce"),
    # HLL estimate over a stored sketch state (the FULL composite's
    # approx_count_distinct finalize rides the scalar compiler)
    "hll_sketch_estimate": _fn_direct("hll_sketch_estimate"),
    "concat": _fn_direct("concat"),
    "substr": lambda c, s, ln=None: F.substring(c, s, ln) if ln is not None else F.substring(c, s, 2147483647),
    "substring": lambda c, s, ln=None: F.substring(c, s, ln) if ln is not None else F.substring(c, s, 2147483647),
    "year": _fn_direct("year"),
    "month": _fn_direct("month"),
    "day": _fn_direct("day"),
    "hour": _fn_direct("hour"),
    "minute": _fn_direct("minute"),
    "second": _fn_direct("second"),
    "sqrt": _fn_direct("sqrt"),
    "exp": _fn_direct("exp"),
    "ln": lambda c: F.log(c),
    "power": lambda a, b: F.pow(a, b),
    "pow": lambda a, b: F.pow(a, b),
    "greatest": _fn_direct("greatest"),
    "least": _fn_direct("least"),
    "nullif": _fn_direct("nullif"),
    "ifnull": lambda a, b: F.coalesce(a, b),
    "md5": _fn_direct("md5"),
    # SQL replace() is LITERAL substring replacement — F.replace (Spark 3.5+),
    # not regexp_replace, else patterns with regex metacharacters diverge
    # between the cached path and passthrough.
    "replace": lambda c, a, b: F.replace(c, F.lit(a), F.lit(b)),
    "regexp_replace": lambda c, p, r: F.regexp_replace(c, p, r),
    "contains": lambda c, s: c.contains(s),
    "starts_with": lambda c, s: c.startswith(s),
    "prefix": lambda c, s: c.startswith(s),
    "ends_with": lambda c, s: c.endswith(s),
    "suffix": lambda c, s: c.endswith(s),
    "lpad": _fn_direct("lpad"),
    "rpad": _fn_direct("rpad"),
    # array finishers (used over collect_set/array_agg at finalize):
    # duckdb spellings aliased to the Spark builtins
    "array_sort": lambda c: F.array_sort(c),
    "list_sort": lambda c: F.array_sort(c),
    "array_join": lambda c, d, *r: F.array_join(c, d, *r),
    "array_to_string": lambda c, d, *r: F.array_join(c, d, *r),
    "array_size": lambda c: F.size(c),
    # single-µs-int form (duckdb's make_timestamp(us)); used by the planner
    # to pin now() as an epoch literal, tz-independent
    "make_timestamp": lambda us: F.timestamp_micros(us),
    "now": lambda: F.current_timestamp(),
    "current_timestamp": lambda: F.current_timestamp(),
    "current_date": lambda: F.current_date(),
    "to_timestamp": lambda c, *fmt: F.to_timestamp(c, *fmt),
    "to_date": lambda c, *fmt: F.to_date(c, *fmt),
    # duckdb lowers EXTRACT(field FROM ts) to date_part('field', ts); the
    # field literal arrives as a foldable lit Column, which Spark accepts.
    # Arity-guarded: duckdb also has date_part(['year','month'], ts) (a
    # struct-returning list form) and other arities — those must degrade to
    # Unsupported/passthrough, not TypeError.
    "date_part": lambda *a: _date_part(*a),
    "datepart": lambda *a: _date_part(*a),
    # duckdb interval constructors (INTERVAL 1 DAY lowers to to_days(1)):
    # needed to evaluate dynamic lower bounds `now() - INTERVAL ...`
    "to_years": lambda n: F.make_interval(n),
    "to_months": lambda n: F.make_interval(F.lit(0), n),
    "to_weeks": lambda n: F.make_interval(F.lit(0), F.lit(0), n),
    "to_days": lambda n: F.make_interval(F.lit(0), F.lit(0), F.lit(0), n),
    "to_hours": lambda n: F.make_dt_interval(F.lit(0), n),
    "to_minutes": lambda n: F.make_dt_interval(F.lit(0), F.lit(0), n),
    "to_seconds": lambda n: F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), n),
    "to_milliseconds": lambda n: F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), n.cast("double") / 1000.0
    ),
    "trunc": lambda c: c.cast("long"),
}


def _lit(e: Lit) -> Column:
    if e.value is None:
        return F.lit(None)
    if e.dtype in ("TIMESTAMP", "TIMESTAMP WITH TIME ZONE"):
        return F.lit(str(e.value)).cast("timestamp")
    if e.dtype == "DATE":
        return F.lit(str(e.value)).cast("date")
    if e.dtype and e.dtype.startswith("DECIMAL"):
        # keep decimals EXACT (cast from the string form, preserving the
        # parsed precision/scale) — converting to float would run decimal
        # comparisons as doubles on the cached path, diverging from
        # passthrough at equality/boundary points.
        m = _DECIMAL_RE.match(e.dtype)
        target = f"decimal({m.group(1)},{m.group(2)})" if m else "decimal(38,9)"
        return F.lit(str(e.value)).cast(target)
    return F.lit(e.value)


def order_column(o) -> Column:
    """Compile an :class:`OrderItem` into an ordered Spark Column (used by
    window OVER clauses and post-finalize ORDER BY replay)."""
    c = to_column(o.expr)
    if o.nulls_first is None:
        return c.desc() if o.desc else c.asc()
    if o.desc:
        return c.desc_nulls_first() if o.nulls_first else c.desc_nulls_last()
    return c.asc_nulls_first() if o.nulls_first else c.asc_nulls_last()


def window_column(e) -> Column:
    """Compile a :class:`WindowExpr`. Default frame (``RANGE UNBOUNDED
    PRECEDING .. CURRENT ROW`` — identical in DuckDB and Spark) or an
    explicit ROWS frame (``e.frame`` in rowsBetween encoding; ROWS
    semantics agree between the engines given the same ORDER — the
    moving-average-dashboard shape). Evaluated post-finalize over
    O(state) rows, so an empty PARTITION BY (one-partition exchange) is
    fine here — this never runs against the source table."""
    from pyspark.sql.window import Window

    fn = e.fn
    w = Window.partitionBy(*[to_column(p) for p in e.partition_by])
    if e.order_by:
        w = w.orderBy(*[order_column(o) for o in e.order_by])
    if getattr(e, "frame", None) is not None:
        mode, lo, hi = e.frame
        between = w.rowsBetween if mode == "rows" else w.rangeBetween
        w = between(
            Window.unboundedPreceding if lo is None else lo,
            Window.unboundedFollowing if hi is None else hi,
        )
    if fn in ("row_number", "rank", "dense_rank", "percent_rank", "cume_dist"):
        return getattr(F, fn)().over(w)
    if fn == "ntile":
        n = e.args[0]
        if not isinstance(n, Lit) or not isinstance(n.value, int):
            raise Unsupported("non-literal ntile bucket count")
        return F.ntile(n.value).over(w)
    if fn in ("lag", "lead"):
        off = 1
        if e.offset is not None:
            if not isinstance(e.offset, Lit) or not isinstance(e.offset.value, int):
                raise Unsupported(f"non-literal {fn} offset")
            off = e.offset.value
        dflt = None
        if e.default is not None:
            if not isinstance(e.default, Lit):
                raise Unsupported(f"non-literal {fn} default")
            dflt = e.default.value
        return getattr(F, fn)(to_column(e.args[0]), off, dflt).over(w)
    if fn in ("first_value", "last_value"):
        return (F.first if fn == "first_value" else F.last)(
            to_column(e.args[0]), ignorenulls=getattr(e, "ignore_nulls", False)
        ).over(w)
    if fn == "nth_value":
        if len(e.args) != 2 or not isinstance(e.args[1], Lit) \
                or not isinstance(e.args[1].value, int) or e.args[1].value < 1:
            raise Unsupported("nth_value needs a positive literal n")
        return F.nth_value(
            to_column(e.args[0]),
            e.args[1].value,
            getattr(e, "ignore_nulls", False),
        ).over(w)
    if fn in ("sum", "avg", "min", "max", "count"):
        from ..plans.ir import Star as _Star

        # count(*) OVER (...) arrives with no children in the duckdb AST
        arg = (
            F.lit(1)
            if (fn == "count" and (not e.args or isinstance(e.args[0], _Star)))
            else to_column(e.args[0])
        )
        return getattr(F, fn)(arg).over(w)
    raise Unsupported(f"window function {fn}")


def to_column(e: Expr) -> Column:
    """Compile an IR expression (no AggCall nodes) to a Spark Column."""
    from ..plans.ir import WindowExpr as _WindowExpr

    if isinstance(e, _WindowExpr):
        return window_column(e)
    if isinstance(e, Col):
        return F.col(e.name)
    if isinstance(e, Lit):
        return _lit(e)
    if isinstance(e, Star):
        raise Unsupported("bare * outside count(*)")
    if isinstance(e, Cast):
        return to_column(e.child).cast(spark_type_for(e.to_type))
    if isinstance(e, Neg):
        return -to_column(e.child)
    if isinstance(e, Not):
        return ~to_column(e.child)
    if isinstance(e, IsNull):
        c = to_column(e.child)
        return c.isNotNull() if e.negated else c.isNull()
    if isinstance(e, InList):
        c = to_column(e.child).isin(*[to_column(v) for v in e.values])
        return ~c if e.negated else c
    if isinstance(e, Case):
        out = None
        for cond, val in e.whens:
            if out is None:
                out = F.when(to_column(cond), to_column(val))
            else:
                out = out.when(to_column(cond), to_column(val))
        if e.otherwise is not None:
            out = out.otherwise(to_column(e.otherwise))
        return out
    if isinstance(e, BinOp):
        l, r = to_column(e.left), to_column(e.right)
        op = e.op
        if op == "and":
            return l & r
        if op == "or":
            return l | r
        if op == "=":
            return l == r
        if op == "!=":
            return l != r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r
        if op == "//":
            return F.floor(l / r)
        if op == "%":
            return l % r
        if op == "is_distinct":
            # IS DISTINCT FROM ≡ NOT (a <=> b)
            return ~l.eqNullSafe(r)
        if op == "is_not_distinct":
            return l.eqNullSafe(r)
        if op == "like":
            if isinstance(e.right, Lit):
                return l.like(str(e.right.value))
            raise Unsupported("non-literal LIKE pattern")
        if op == "not_like":
            if isinstance(e.right, Lit):
                return ~l.like(str(e.right.value))
            raise Unsupported("non-literal LIKE pattern")
        raise Unsupported(f"binop {op}")
    if isinstance(e, Func):
        fname = e.name.lower()
        if fname == "__qc_pctl_fin":
            # INTERNAL (FULL composite output position): percentile walk
            # over a merged RLE-histogram column; arg1 is the literal
            # fraction (see partial.histogram_percentile)
            from .partial import histogram_percentile

            if len(e.args) != 2 or not isinstance(e.args[1], Lit):
                raise Unsupported("__qc_pctl_fin arity")
            return histogram_percentile(
                to_column(e.args[0]), float(e.args[1].value)
            )
        if fname == "__qc_struct":
            # INTERNAL (FULL composite multi-arg DISTINCT): tuple
            # construction with deterministic f{i} field names — the
            # A-half's stored state schema and the anti side compile the
            # SAME expression, and the names match the normal path's
            # count(DISTINCT a, b) tuple state
            return F.struct(
                *[
                    to_column(a).alias(f"f{i}")
                    for i, a in enumerate(e.args)
                ]
            )
        if fname == "__qc_ddq":
            # INTERNAL (FULL composite pre-state transform): DDSketch
            # log-gamma quantization; arg1 is the literal eps. Both
            # halves and the anti side compile THIS same expression, so
            # merged histograms share one bin layout.
            from .partial import ddsketch_quantize

            if len(e.args) != 2 or not isinstance(e.args[1], Lit):
                raise Unsupported("__qc_ddq arity")
            return ddsketch_quantize(
                to_column(e.args[0]).cast("double"), float(e.args[1].value)
            )
        if fname in ("__qc_set_sum", "__qc_set_avg"):
            # INTERNAL (FULL composite output position): sum/avg over a
            # merged DISTINCT value-set column; arg1 is the literal
            # element cast type ("long"/"double" — mirrors the normal
            # path's sum(DISTINCT) out_t derivation)
            if len(e.args) != 2 or not isinstance(e.args[1], Lit):
                raise Unsupported(f"{fname} arity")
            st = to_column(e.args[0])
            out_t = str(e.args[1].value)
            total = F.aggregate(
                st,
                F.lit(None).cast(out_t),
                lambda acc, x: F.coalesce(acc, F.lit(0).cast(out_t))
                + x.cast(out_t),
            )
            if fname == "__qc_set_avg":
                return F.when(
                    F.array_size(st) > 0, total / F.array_size(st)
                )
            return total
        builder = _FUNCS.get(fname)
        if builder is None:
            raise Unsupported(f"scalar function {e.name}")
        args = []
        for a in e.args:
            # scalar-literal args that must stay python (date_trunc fmt, round n)
            if isinstance(a, Lit) and e.name.lower() in ("date_trunc", "round", "substr", "substring", "power", "pow", "lpad", "rpad", "to_timestamp", "array_join", "array_to_string", "date_part", "datepart") and not isinstance(a.value, (dict, list)):
                args.append(a.value)
            else:
                args.append(to_column(a))
        return builder(*args)
    if isinstance(e, AggCall):
        raise Unsupported("aggregate call reached scalar compiler")
    raise Unsupported(f"cannot compile {type(e).__name__}")


#: AggCall fn → pyspark.sql.functions name for PLAIN (non-incremental)
#: re-aggregation — used only over already-finalized O(state) results
#: (outer aggregates above a cached derived table), never on cached state,
#: so no partial/merge decomposition is needed.
_PLAIN_AGGS = {
    "count": "count",
    "sum": "sum",
    "min": "min",
    "max": "max",
    "avg": "avg",
    "var_samp": "var_samp",
    "var_pop": "var_pop",
    "stddev_samp": "stddev_samp",
    "stddev_pop": "stddev_pop",
    "min_by": "min_by",
    "max_by": "max_by",
    "corr": "corr",
    "covar_samp": "covar_samp",
    "covar_pop": "covar_pop",
    "collect_set": "collect_set",
    "array_agg": "collect_list",
    "median": "median",
    "mode": "mode",
    "bool_and": "bool_and",
    "bool_or": "bool_or",
    "bit_and": "bit_and",
    "bit_or": "bit_or",
    "bit_xor": "bit_xor",
    "approx_count_distinct": "approx_count_distinct",
    "product": "product",
}


def plain_agg_column(a: AggCall) -> Column:
    """Compile an AggCall into a plain Spark aggregate Column.

    For re-aggregation OVER a finalized cached result (outer
    ``GROUP BY``/aggregates above a derived table): the input is exact and
    O(state)-small, so ordinary Spark aggregation is both correct and
    cheap — decomposability (functions/partial.py) is irrelevant here.
    ``first``/``last`` are refused: bare Spark first/last are
    order-arbitrary, and the engine's time-series rewrite (min_by/max_by
    on the temporal column) has no temporal column at this level."""
    fn = a.fn.lower()
    if fn == "count" and len(a.args) == 1 and isinstance(a.args[0], Star):
        if a.distinct:
            raise Unsupported("count(DISTINCT *) above a derived table")
        return F.count(F.lit(1))
    if any(isinstance(n, AggCall) for arg in a.args for n in arg.walk()):
        raise Unsupported("nested aggregate")
    args = [to_column(x) for x in a.args]
    if a.distinct:
        if fn == "count":
            return F.count_distinct(*args)
        if fn == "sum":
            return F.sum_distinct(args[0])
        raise Unsupported(f"{fn}(DISTINCT) above a derived table")
    if fn in ("percentile", "percentile_cont", "quantile"):
        if len(args) != 2:
            raise Unsupported(f"{fn} arity above a derived table")
        return F.percentile(args[0], args[1])
    name = _PLAIN_AGGS.get(fn)
    if name is None:
        raise Unsupported(f"aggregate {fn} above a derived table")
    return getattr(F, name)(*args)

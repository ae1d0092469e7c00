"""Driver-local dynamic-refresh scan tier ("nano").

The dynamic-bound warm path's floor cost in Spark is the per-refresh JVM
query compilation: any job with fresh literal bounds pays parse + analyze
+ optimize + whole-stage-codegen (~0.2-0.3 s here) before a single row
moves — at small scale that fixed cost alone exceeds a plain rescan. The
reference has no such floor: DataFusion plans in-process in microseconds
(``src/aggregate.rs`` just rebuilds the plan per call).

This tier removes the floor for the case where Spark adds no value: the
per-refresh scan volume is tiny (a fresh tail plus one boundary bucket of
a BYTES-GATED local parquet source). It scans driver-side with a pyarrow
dataset (parquet row-group statistics pruning — the same pushdown story
as the Spark scan), computes the partial aggregates with vectorized
``Table.group_by`` (no Python per-row loop), and hands the handful of
partial rows to the same driver merge the lite tier uses
(``functions/partial.py py_merge/py_finalize``).

Admission is a strict contract, everything else falls through to the
distributed tiers (lite → fused template → classic):

* the source view was registered through ``sources.tables
  .register_parquet_view`` (so its exact derivation — ns-shadow
  normalization over raw parquet files — is KNOWN; arbitrary user views
  never qualify), and the files' total size fits
  ``config.nano_refresh_max_bytes`` (bytes, not rows);
* single table, no joins, no residual predicate, session timezone UTC
  (the data axis is tz-free µs/ns; UTC makes the Python calendar mirror
  of ``date_trunc``/interval arithmetic exact);
* group keys are bare columns or ``date_trunc`` buckets of the temporal
  column; aggregate arguments are bare columns (count/sum/min/max/avg);
* the dynamic bound is ``now()/current_date() ± INTERVAL`` shapes the
  Python evaluator mirrors exactly (month/year intervals use Spark's
  end-of-month clamp); anything else uses the JVM one-row evaluator.

At 100 TB the gate simply never admits: the source is not a
driver-local parquet file set under the byte budget, and the distributed
tiers — whose scans push down and prune exactly — run instead.
"""

from __future__ import annotations

import calendar
import datetime as dt
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from .plans.ir import AggCall, BinOp, Cast, Col, Expr, Func, Lit, Star

_EPOCH = dt.datetime(1970, 1, 1)


class NanoUnsupported(Exception):
    """Shape outside the nano contract → distributed tiers."""


# ---------------------------------------------------------------------------
# Python mirrors of the JVM-side temporal arithmetic (UTC session only)
# ---------------------------------------------------------------------------

def _us_of(d: dt.datetime) -> int:
    delta = d - _EPOCH
    # exact integer µs (timedelta is normalized: seconds/microseconds
    # non-negative even for pre-epoch values)
    return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds


def _dt_of_us(us: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(microseconds=us)


_TRUNC_ALIASES = {
    "dd": "day", "hh": "hour", "mon": "month", "mm": "month",
    "yyyy": "year", "yy": "year",
}


def trunc_dt(d: dt.datetime, gran: str) -> dt.datetime:
    """``date_trunc(gran, d)`` for a tz-free timestamp — exact mirror of
    Spark's UTC-session behavior (week starts Monday)."""
    g = _TRUNC_ALIASES.get(gran.lower(), gran.lower())
    if g == "minute":
        return d.replace(second=0, microsecond=0)
    if g == "hour":
        return d.replace(minute=0, second=0, microsecond=0)
    if g == "day":
        return d.replace(hour=0, minute=0, second=0, microsecond=0)
    if g == "week":
        day0 = d.replace(hour=0, minute=0, second=0, microsecond=0)
        return day0 - dt.timedelta(days=day0.weekday())
    if g == "month":
        return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if g == "quarter":
        m = 3 * ((d.month - 1) // 3) + 1
        return d.replace(month=m, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if g == "year":
        return d.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    raise NanoUnsupported(f"date_trunc granularity {gran}")


def add_months(d: dt.datetime, months: int) -> dt.datetime:
    """Spark's timestamp + INTERVAL months: calendar add with end-of-month
    day clamp (Mar 31 - 1 month = Feb 28/29)."""
    y, m = divmod(d.year * 12 + (d.month - 1) + months, 12)
    last = calendar.monthrange(y, m + 1)[1]
    return d.replace(year=y, month=m + 1, day=min(d.day, last))


def bucket_end(b: dt.datetime, gran: str) -> dt.datetime:
    g = _TRUNC_ALIASES.get(gran.lower(), gran.lower())
    if g == "minute":
        return b + dt.timedelta(minutes=1)
    if g == "hour":
        return b + dt.timedelta(hours=1)
    if g == "day":
        return b + dt.timedelta(days=1)
    if g == "week":
        return b + dt.timedelta(days=7)
    if g == "month":
        return add_months(b, 1)
    if g == "quarter":
        return add_months(b, 3)
    if g == "year":
        return add_months(b, 12)
    raise NanoUnsupported(f"bucket granularity {gran}")


_NOW_FNS = frozenset(
    ("now", "current_timestamp", "localtimestamp", "get_current_timestamp",
     "transaction_timestamp")
)
#: interval constructor → (months, timedelta-per-unit); mirrors
#: functions/compile.py's duckdb interval lowering
_IV_FNS = {
    "to_years": (12, None),
    "to_months": (1, None),
    "to_weeks": (0, dt.timedelta(weeks=1)),
    "to_days": (0, dt.timedelta(days=1)),
    "to_hours": (0, dt.timedelta(hours=1)),
    "to_minutes": (0, dt.timedelta(minutes=1)),
    "to_seconds": (0, dt.timedelta(seconds=1)),
    "to_milliseconds": (0, dt.timedelta(milliseconds=1)),
    "to_microseconds": (0, dt.timedelta(microseconds=1)),
}


def _iv_count(e: Expr) -> int:
    """Unwrap the duckdb interval-count lowering —
    ``to_days(CAST(trunc(CAST(10 AS DOUBLE)) AS INTEGER))`` — to the
    integral literal inside; raise on anything non-literal."""
    while True:
        if isinstance(e, Cast):
            e = e.child
            continue
        if isinstance(e, Func) and e.name.lower() == "trunc" and len(e.args) == 1:
            e = e.args[0]
            continue
        break
    if isinstance(e, Lit) and isinstance(e.value, (int, float)):
        v = e.value
        if float(v) == int(v):
            return int(v)
    raise NanoUnsupported(f"interval count {e!r}")


def validate_bound_expr(rhs: Expr) -> None:
    """Raise NanoUnsupported unless ``eval_bound`` can evaluate ``rhs``."""
    if isinstance(rhs, Func):
        nl = rhs.name.lower()
        if nl in _NOW_FNS or nl in ("current_date", "today"):
            return
        if nl in _IV_FNS:
            if len(rhs.args) == 1:
                _iv_count(rhs.args[0])
                return
            raise NanoUnsupported(f"interval arg of {rhs.name}")
        raise NanoUnsupported(f"function {rhs.name} in bound")
    if isinstance(rhs, BinOp) and rhs.op in ("+", "-"):
        validate_bound_expr(rhs.left)
        validate_bound_expr(rhs.right)
        return
    if isinstance(rhs, Cast) and rhs.to_type.upper() in ("DATE", "TIMESTAMP"):
        validate_bound_expr(rhs.child)
        return
    raise NanoUnsupported(f"bound node {type(rhs).__name__}")


def eval_bound(rhs: Expr, now_ns: int):
    """Evaluate the pinned dynamic bound in Python — exact mirror of the
    JVM evaluation under a UTC session (now pinned to floor-µs, identical
    to ``_pin_now``'s ``timestamp_micros(now_ns // 1000)``)."""
    now_dt = _dt_of_us(now_ns // 1000)

    def ev(x):
        if isinstance(x, Func):
            nl = x.name.lower()
            if nl in _NOW_FNS:
                return now_dt
            if nl in ("current_date", "today"):
                return now_dt.date()
            if nl in _IV_FNS:
                months, unit = _IV_FNS[nl]
                n = _iv_count(x.args[0])
                if months:
                    return ("months", months * n)
                return unit * n
            raise NanoUnsupported(f"function {x.name}")
        if isinstance(x, BinOp):
            l, r = ev(x.left), ev(x.right)
            sign = 1 if x.op == "+" else -1
            if isinstance(l, tuple) or isinstance(r, tuple):
                base, mdelta = (r, l) if isinstance(l, tuple) else (l, r)
                if isinstance(base, dt.date) and not isinstance(base, dt.datetime):
                    base = dt.datetime(base.year, base.month, base.day)
                return add_months(base, sign * mdelta[1])
            base, delta = (r, l) if isinstance(l, dt.timedelta) else (l, r)
            if isinstance(base, dt.date) and not isinstance(base, dt.datetime):
                base = dt.datetime(base.year, base.month, base.day)
            return base + sign * delta
        if isinstance(x, Cast):
            v = ev(x.child)
            if x.to_type.upper() == "DATE":
                return v.date() if isinstance(v, dt.datetime) else v
            if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
                return dt.datetime(v.year, v.month, v.day)
            return v
        raise NanoUnsupported(f"bound node {type(x).__name__}")

    v = ev(rhs)
    if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
        v = dt.datetime(v.year, v.month, v.day)
    if not isinstance(v, dt.datetime):
        raise NanoUnsupported(f"bound evaluated to {type(v).__name__}")
    return v


# ---------------------------------------------------------------------------
# Group / aggregate specs (parsed from the query IR at build time)
# ---------------------------------------------------------------------------

@dataclass
class _GroupSpec:
    name: str
    kind: str  # "col" | "trunc"
    col: str
    gran: str = ""
    as_date: bool = False
    #: trunc bucket stored as an ltz timestamp (timestamp[us, tz=UTC]
    #: arrow-side): the UTC-session gate makes the aware instants equal to
    #: the naive UTC floor, so the mirror just annotates the tz
    ltz: bool = False


def _source_bytes(p: str) -> int:
    """Total on-disk bytes under a registered parquet source path — the
    shared byte-gate walk of both nano builders (aggregate and top-k)."""
    return (
        os.path.getsize(p)
        if os.path.isfile(p)
        else sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )
    )


def _parse_pred(e: Expr):
    """Compile a residual predicate into a pyarrow mask builder, or raise.

    Supported: conjunctions of comparisons between a bare column and a
    numeric/string/bool literal, IS [NOT] NULL, and NOT — shapes whose
    SQL semantics pyarrow reproduces exactly (a NULL comparison yields a
    null mask entry, and ``Table.filter`` drops null-mask rows just as
    SQL WHERE does)."""
    from .plans.ir import InList, IsNull, Not

    if isinstance(e, BinOp):
        if e.op in ("and",):
            lf, lc = _parse_pred(e.left)
            rf, rc = _parse_pred(e.right)

            def _and(tbl, _lf=lf, _rf=rf):
                import pyarrow.compute as pc

                return pc.and_(_lf(tbl), _rf(tbl))

            return _and, lc | rc
        if e.op in (">", ">=", "<", "<=", "=", "!="):
            col, lit, op = None, None, e.op
            flip = {">": "<", ">=": "<=", "<": ">", "<=": ">="}
            if isinstance(e.left, Col) and isinstance(e.right, Lit):
                col, lit = e.left.name, e.right.value
            elif isinstance(e.right, Col) and isinstance(e.left, Lit):
                col, lit, op = e.right.name, e.left.value, flip.get(op, op)
            if col is None or not isinstance(lit, (int, float, str, bool)):
                raise NanoUnsupported(f"predicate comparison {e!r}")
            if isinstance(lit, float) and math.isnan(lit):
                # Spark: NaN = NaN is TRUE, NaN uniquely ordered — IEEE
                # disagrees on every operator; don't mirror NaN literals
                raise NanoUnsupported("NaN literal in predicate")
            fns = {
                ">": "greater", ">=": "greater_equal", "<": "less",
                "<=": "less_equal", "=": "equal", "!=": "not_equal",
            }

            def _cmp(tbl, _c=col, _l=lit, _f=fns[op], _op=op):
                import pyarrow as pa
                import pyarrow.compute as pc

                colv = tbl.column(_c)
                m = getattr(pc, _f)(colv, _l)
                if _op in (">", ">=") and pa.types.is_floating(colv.type):
                    # Spark orders NaN ABOVE every number: NaN > lit and
                    # NaN >= lit are TRUE there, FALSE in IEEE/pyarrow —
                    # add NaN rows back so the mirror admits exactly what
                    # the Spark scan admits (<, <=, =, != already agree)
                    m = pc.or_(m, pc.is_nan(colv))
                return m

            return _cmp, {col}
    if isinstance(e, Not):
        f, cols = _parse_pred(e.child)

        def _not(tbl, _f=f):
            import pyarrow.compute as pc

            return pc.invert(_f(tbl))

        return _not, cols
    if isinstance(e, IsNull) and isinstance(e.child, Col):
        name = e.child.name
        neg = bool(getattr(e, "negated", False))

        def _isnull(tbl, _c=name, _n=neg):
            import pyarrow.compute as pc

            m = pc.is_null(tbl.column(_c))
            return pc.invert(m) if _n else m

        return _isnull, {name}
    raise NanoUnsupported(f"predicate node {type(e).__name__}")


def _parse_group(item, ts_col: str) -> _GroupSpec:
    e = item.expr
    as_date = False
    if isinstance(e, Cast) and e.to_type.upper() == "DATE":
        as_date = True
        e = e.child
    if isinstance(e, Col):
        if as_date:
            raise NanoUnsupported(f"CAST(col AS DATE) group {item.name}")
        return _GroupSpec(item.name, "col", e.name)
    if (
        isinstance(e, Func)
        and e.name.lower() == "date_trunc"
        and len(e.args) == 2
        and isinstance(e.args[0], Lit)
        and isinstance(e.args[1], Col)
        and e.args[1].name == ts_col
    ):
        gran = _TRUNC_ALIASES.get(
            str(e.args[0].value).lower(), str(e.args[0].value).lower()
        )
        if gran not in ("minute", "hour", "day", "week", "month", "quarter",
                        "year"):
            raise NanoUnsupported(f"date_trunc granularity {gran}")
        return _GroupSpec(item.name, "trunc", e.args[1].name, gran, as_date)
    raise NanoUnsupported(f"group expression for {item.name}")


@dataclass
class _AggRecipe:
    """How one state column is produced by the pyarrow group_by."""

    state_col: str
    src: str  # source column in the working table (may be a derived name)
    fn: str  # pyarrow aggregate: sum / min / max / count
    mode: str = "only_valid"  # for count
    #: builds the source array from the loaded table (None ⇒ plain column)
    derive: Optional[object] = None
    #: raw columns the derive reads (for projection pushdown)
    cols: frozenset = frozenset()
    #: the derive floated a Decimal literal: every referenced column must
    #: be float64 so Spark's expression type is double (checked at build)
    needs_float_cols: bool = False
    #: post-processes the raw pyarrow aggregate value with the state dict
    #: built so far (recipes-order): ``post(raw_value, st) -> value``.
    #: Used by the central-moment family, whose M2 state is var_pop·n.
    post: Optional[object] = None


def _compile_arg(e: Expr):
    """Compile an aggregate ARGUMENT expression into a pyarrow array
    builder — bare columns plus ``+ - *`` arithmetic over columns and
    numeric literals, whose elementwise fp/int semantics (null
    propagation, int-literal widening) pyarrow reproduces exactly.
    Returns (builder, raw columns, canonical key, has_decimal_lit).
    Decimal literals (SQL ``0.001``) are floated — exact ONLY when the
    expression is double-typed (Spark promotes the whole thing to
    double); the caller enforces the all-float64-columns guard, since
    int-only operands would keep Spark in EXACT decimal arithmetic.
    Division is NOT mirrored: SQL ``x / 0`` is NULL (non-ANSI) where
    pyarrow yields inf/raise."""
    import decimal

    if isinstance(e, Col):
        name = e.name
        return (
            (lambda tbl: tbl.column(name)), frozenset([name]),
            f"c:{name}", False,
        )
    if isinstance(e, Lit) and isinstance(e.value, (int, float)):
        v = e.value
        return (lambda tbl: v), frozenset(), f"l:{v!r}", False
    if isinstance(e, Lit) and isinstance(e.value, decimal.Decimal):
        v = float(e.value)
        return (lambda tbl: v), frozenset(), f"l:{v!r}", True
    if isinstance(e, BinOp) and e.op in ("+", "-", "*"):
        lf, lc, lk, ld = _compile_arg(e.left)
        rf, rc, rk, rd = _compile_arg(e.right)
        fn_name = {"+": "add", "-": "subtract", "*": "multiply"}[e.op]

        def _bin(tbl, _lf=lf, _rf=rf, _f=fn_name):
            import pyarrow.compute as pc

            return getattr(pc, _f)(_lf(tbl), _rf(tbl))

        return _bin, lc | rc, f"({lk}{e.op}{rk})", ld or rd
    raise NanoUnsupported(f"aggregate argument {type(e).__name__}")


@dataclass
class _DimJoin:
    """One left-deep join step against a registered (small) dim table.

    pyarrow's hash join reproduces SQL equi-join semantics exactly for
    the admitted shapes: INNER drops null-key rows on both sides, LEFT
    OUTER keeps unmatched/null-key left rows with null right columns,
    and duplicate right keys fan out. The right key column is coalesced
    away (same as SQL USING); all other loaded columns ride through."""

    table: str
    path: str
    how: str  # "inner" | "left outer"
    left_key: str
    right_key: str
    columns: List[str]


def _recipe_cols(r: _AggRecipe) -> frozenset:
    """Raw source columns one recipe reads (projection pushdown)."""
    if r.cols:
        return r.cols
    src = r.src
    if src.startswith("__qc_f64_"):
        src = src[len("__qc_f64_"):]
    return frozenset([src])


def _parse_aggs(plans, ts_col: str) -> Tuple[List[_AggRecipe], List[str]]:
    """Map every unique decomposition's state columns to pyarrow
    aggregate recipes. Arguments may be bare columns or ``+ - *``
    arithmetic (see :func:`_compile_arg`); non-column arguments become
    derived working-table columns. Returns (recipes, nan_check_srcs) —
    the latter need a NaN runtime check under min/max (pyarrow orders
    NaN differently from Spark's NaN-greatest)."""
    recipes: List[_AggRecipe] = []
    nan_check: List[str] = []
    seen = set()
    for p in plans:
        for a, dec in p.decs:
            state_cols = tuple(dec.partial.keys())
            if state_cols in seen:
                continue
            seen.add(state_cols)
            fn = a.fn.lower()
            star = not a.args or isinstance(a.args[0], Star)
            if fn == "count" and star:
                recipes.append(_AggRecipe(state_cols[0], ts_col, "count",
                                          "all"))
                continue
            if fn == "count" and a.distinct:
                # set state: pyarrow's `distinct` group aggregation drops
                # nulls like collect_set; only a bare non-float column
                # carries a py mirror (enforced upstream by the dec gate)
                if not isinstance(a.args[0], Col):
                    raise NanoUnsupported("count(DISTINCT expr)")
                src = a.args[0].name
                recipes.append(_AggRecipe(state_cols[0], src, "distinct",
                                          cols=frozenset([src])))
                continue
            if star:
                raise NanoUnsupported(f"aggregate {fn}(*)")
            if isinstance(a.args[0], Col):
                src = a.args[0].name
                derive, cols, has_dec = None, frozenset([src]), False
            else:
                derive, cols, key, has_dec = _compile_arg(a.args[0])
                if not cols:
                    raise NanoUnsupported("column-free aggregate argument")
                import hashlib

                src = f"__qc_expr_{hashlib.md5(key.encode()).hexdigest()[:10]}"
            if fn == "count":
                recipes.append(_AggRecipe(state_cols[0], src, "count",
                                          derive=derive, cols=cols,
                                          needs_float_cols=has_dec))
            elif fn == "product":
                recipes.append(_AggRecipe(state_cols[0], src, "product",
                                          derive=derive, cols=cols,
                                          needs_float_cols=has_dec))
            elif fn == "sum":
                recipes.append(_AggRecipe(state_cols[0], src, "sum",
                                          derive=derive, cols=cols,
                                          needs_float_cols=has_dec))
            elif fn in ("min", "max"):
                recipes.append(_AggRecipe(state_cols[0], src, fn,
                                          derive=derive, cols=cols,
                                          needs_float_cols=has_dec))
                nan_check.append(src)
            elif fn == "avg":
                # state: (sum double, count) — cast the source up front
                recipes.append(_AggRecipe(
                    state_cols[0], f"__qc_f64_{src}", "sum",
                    derive=derive, cols=cols, needs_float_cols=has_dec,
                ))
                recipes.append(_AggRecipe(state_cols[1], src, "count",
                                          derive=derive, cols=cols,
                                          needs_float_cols=has_dec))
            elif fn in ("var_samp", "var_pop", "stddev_samp", "stddev_pop"):
                # central-moment state (count, mean, M2) — pyarrow's own
                # hash mean/variance kernels are numerically stable (no
                # power-sum cancellation, mirroring the Spark-side
                # var_pop·n partial); M2 = var_pop · n via the post hook,
                # with the same NULL→0.0 normalization as the SQL partial
                recipes.append(_AggRecipe(state_cols[0], src, "count",
                                          derive=derive, cols=cols,
                                          needs_float_cols=has_dec))
                recipes.append(_AggRecipe(
                    state_cols[1], f"__qc_f64_{src}", "mean",
                    derive=derive, cols=cols, needs_float_cols=has_dec,
                    post=lambda v, st: 0.0 if v is None else v,
                ))
                recipes.append(_AggRecipe(
                    state_cols[2], f"__qc_f64_{src}", "variance",
                    derive=derive, cols=cols, needs_float_cols=has_dec,
                    post=lambda v, st, _n=state_cols[0]: (
                        0.0 if v is None else v * st[_n]
                    ),
                ))
            else:
                raise NanoUnsupported(f"aggregate {fn}")
    return recipes, nan_check


# ---------------------------------------------------------------------------
# The program
# ---------------------------------------------------------------------------

class NanoProgram:
    """Bytes-gated driver-side refresh scan for one query shape."""

    def __init__(
        self,
        path: str,
        ts_col: str,
        ts_kind: str,  # "us" | "ns_long"
        groups: List[_GroupSpec],
        recipes: List[_AggRecipe],
        nan_check: List[str],
        bucket_gran: str,
        dyn_op: str,
        rhs: Optional[Expr],
        rhs_python: bool,
        bucket_is_date: bool,
        pred_fn=None,
        pred_cols: Optional[set] = None,
        static: bool = False,
        fact_columns: Optional[List[str]] = None,
        dims: Optional[List[_DimJoin]] = None,
    ):
        import pyarrow.dataset as pds

        self.path = path
        self.ts_col = ts_col
        self.ts_kind = ts_kind
        self.groups = groups
        self.recipes = recipes
        self.nan_check = nan_check
        self.bucket_gran = bucket_gran
        self.dyn_op = dyn_op
        self.rhs = rhs
        self.rhs_python = rhs_python
        self.bucket_is_date = bucket_is_date
        self.pred_fn = pred_fn
        self.static = static
        self.dims = dims or []
        # built once: dataset handles cache parquet footers across refreshes
        self._ds = pds.dataset(path, format="parquet")
        self._dim_ds = [
            pds.dataset(d.path, format="parquet") for d in self.dims
        ]
        self._src_sig = self._stat_sig()
        if fact_columns is not None:
            self.columns = sorted(fact_columns)
        else:
            need = {ts_col}
            need.update(g.col for g in groups)
            need.update(pred_cols or set())
            for r in recipes:
                need.update(_recipe_cols(r))
            self.columns = sorted(need)
        missing = [c for c in self.columns if c not in self._ds.schema.names]
        if missing:
            raise NanoUnsupported(f"columns {missing} not in parquet files")
        for d, ds in zip(self.dims, self._dim_ds):
            miss = [c for c in d.columns if c not in ds.schema.names]
            if miss:
                raise NanoUnsupported(f"columns {miss} not in {d.table}")
        import pyarrow as pa

        ftype = self._ds.schema.field(ts_col).type
        want_unit = "ns" if ts_kind == "ns_long" else "us"
        if not (
            pa.types.is_timestamp(ftype)
            and ftype.unit == want_unit
            and ftype.tz is None
        ):
            # tz-annotated or off-unit parquet timestamps: comparisons
            # against naive scalars would be wrong/throw — distributed tiers
            raise NanoUnsupported(f"{ts_col} parquet type {ftype}")
        # decimal-literal args: every referenced column must be float64 so
        # Spark's expression type is double (int operands would keep Spark
        # in exact decimal arithmetic our float mirror can't reproduce)
        type_of = {}
        for ds in [self._ds] + self._dim_ds:
            for fld in ds.schema:
                type_of.setdefault(fld.name, fld.type)
        for r in self.recipes:
            if r.needs_float_cols:
                for c in r.cols:
                    t = type_of.get(c)
                    if t is None or not pa.types.is_float64(t):
                        raise NanoUnsupported(
                            f"decimal-literal arg over non-double column {c}"
                        )
        # working-table name-collision guards: a group alias that shadows a
        # different source column would silently aggregate the wrong data
        all_cols = set(self.columns)
        for d in self.dims:
            all_cols.update(d.columns)
        for g in groups:
            if g.kind == "col" and g.name != g.col:
                raise NanoUnsupported(f"aliased group column {g.name}")
            if g.kind == "trunc" and g.name in all_cols:
                raise NanoUnsupported(f"bucket alias {g.name} shadows a column")

    def _stat_sig(self):
        import pyarrow.dataset as pds

        def one(p):
            st = os.stat(p)
            return (st.st_mtime_ns, st.st_size)

        # top-level paths (directory mtime catches part-file add/remove at
        # the root) PLUS a FRESH per-source file discovery: the file NAME
        # list catches add/remove/rename anywhere in the tree — including
        # under nested subdirectories (hive-partitioned layouts), where a
        # new part file bumps only the subdirectory's mtime — and the
        # per-file stats catch an existing part file rewritten IN PLACE
        # (open+truncate, no rename: only the file's mtime moves). The
        # re-discovery walk is bounded by the same byte gate that admits
        # the nano tier, so the file set is always small.
        #
        # The fresh discovery is anchored to the PINNED scan set
        # (self._ds / self._dim_ds — the handles _scan actually reads):
        # if they ever diverge, we raise rather than sign a file list the
        # scan never reads. At build time (called from __init__) that
        # catches a part file added/removed between dataset construction
        # and signing; at validate time it is the drift signal itself.
        paths = [self.path] + [d.path for d in self.dims]
        pinned = [sorted(ds.files) for ds in [self._ds] + self._dim_ds]
        sig = [one(p) for p in paths]
        for p, pin in zip(paths, pinned):
            files = sorted(pds.dataset(p, format="parquet").files)
            if files != pin:
                raise NanoUnsupported(
                    f"file set under {p} diverged from the pinned scan set"
                )
            sig.append(tuple(files))
            sig.extend(one(f) for f in files)
        return tuple(sig)

    def validate(self, table: str) -> None:
        """Raise NanoUnsupported when the pinned file set drifted: a view
        was re-registered (possibly over a different path) or a path's
        files changed — overwrite of the path itself, part files added,
        removed, or renamed anywhere in the tree including nested
        subdirectories (caught by re-discovering the dataset's file list
        at validate time), or an existing part file rewritten IN PLACE
        (caught by the per-file stats). Covers the fact table AND every joined dim. The
        caller drops the memoized program so the next refresh REBUILDS
        against the current sources — the distributed tiers, which
        resolve view names per call, serve this refresh correctly in the
        meantime."""
        from .sources.tables import LOCAL_PARQUET_SOURCES

        for name, path in [(table, self.path)] + [
            (d.table, d.path) for d in self.dims
        ]:
            src = LOCAL_PARQUET_SOURCES.get(name)
            if src is None or src["path"] != path:
                raise NanoUnsupported(f"source {name} re-registered")
        try:
            sig = self._stat_sig()
        except NanoUnsupported:
            raise
        except Exception as e:
            # pds.dataset() can raise non-OSError pyarrow exceptions
            # (ArrowInvalid on a corrupt/non-parquet file, schema
            # inference failures) — any failure to re-sign the sources
            # means we cannot prove the pinned program is still valid,
            # so degrade rather than rely on callers' blanket handlers.
            raise NanoUnsupported(f"source stat failed: {e}")
        if sig != self._src_sig:
            raise NanoUnsupported("source files changed since build")

    # -- temporal window mirrors (ints, exact) --------------------------

    def _scan(self, wm_ns: int, now_ns: int, bound_us: int, bhi_us: int):
        """Load admitted rows. The dataset filter is the same pushable
        OR-of-ranges the Spark scan uses — pyarrow prunes whole row groups
        by parquet statistics, so the read set is (fresh-tail row groups)
        ∪ (boundary-bucket row groups), NOT the envelope between them.
        The exact per-row window masks are applied after load, mirroring
        the engine's ns/µs conjunctions exactly."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pds

        f = pds.field(self.ts_col)
        raw_is_ns_ts = self.ts_kind == "ns_long"
        if raw_is_ns_ts:
            # the Spark view reads these as epoch-ns longs (nanosAsLong);
            # pyarrow reads the same parquet as timestamp[ns]
            lo_f = pa.scalar(wm_ns // 1000 * 1000, pa.timestamp("ns"))
            hi_f = pa.scalar(now_ns, pa.timestamp("ns"))
            lo_b = pa.scalar(bound_us * 1000, pa.timestamp("ns"))
            hi_b = pa.scalar(bhi_us * 1000, pa.timestamp("ns"))
        else:
            lo_f = pa.scalar(_dt_of_us(wm_ns // 1000), pa.timestamp("us"))
            hi_f = pa.scalar(_dt_of_us(-(-now_ns // 1000)), pa.timestamp("us"))
            lo_b = pa.scalar(_dt_of_us(bound_us), pa.timestamp("us"))
            hi_b = pa.scalar(_dt_of_us(bhi_us), pa.timestamp("us"))
        flt = (f >= lo_f) & (f < hi_f)
        if not self.static:
            flt = flt | ((f >= lo_b) & (f < hi_b))
        tbl = self._ds.to_table(columns=self.columns, filter=flt)
        # left-deep dim joins over the window-pruned fact (dims are tiny
        # by the byte gate); the window masks below read the JOINED ts
        # column, so fan-out rows carry their fact timestamps correctly
        for d, ds in zip(self.dims, self._dim_ds):
            right = ds.to_table(columns=d.columns)
            tbl = tbl.join(
                right, keys=[d.left_key], right_keys=[d.right_key],
                join_type=d.how,
            )
        if self.pred_fn is not None:
            # residual predicate AFTER joins (may reference dim columns):
            # SQL WHERE semantics (null mask ⇒ dropped)
            tbl = tbl.filter(self.pred_fn(tbl))

        ts = tbl.column(self.ts_col)
        if raw_is_ns_ts:
            ns = pc.cast(ts.combine_chunks(), pa.int64())  # epoch ns
            if tbl.num_rows and pc.min(ns).as_py() < 0:
                # `div 1000` truncates toward zero; pre-1970 values break
                # the trunc≡floor equivalence the µs mirror relies on
                raise NanoUnsupported("negative epoch in ns source")
            us = pc.divide(ns, 1000)  # non-negative ⇒ trunc ≡ floor
            ts_us_dt = pc.cast(us, pa.timestamp("us"))
            # fresh tail: ns ∈ [wm, now); the engine's extra µs bracket is
            # implied (floor/ceil of the same bounds)
            f_mask = pc.and_(pc.greater_equal(ns, wm_ns), pc.less(ns, now_ns))
            # boundary: the engine's exact conjunction — the ns range AND
            # the µs comparisons on the user-facing derived timestamp
            b_mask = pc.and_(
                pc.and_(
                    pc.greater_equal(ns, bound_us * 1000),
                    pc.less(ns, min(now_ns, bhi_us * 1000)),
                ),
                pc.and_(
                    pc.greater(us, bound_us)
                    if self.dyn_op == ">"
                    else pc.greater_equal(us, bound_us),
                    pc.less(us, bhi_us),
                ),
            )
        else:
            # µs/NTZ source: the derived ns shadow is ts*1000 exactly, so
            # the engine's ns∧µs conjunction reduces to ceil-µs bounds
            ts_us_dt = ts
            lo = pa.scalar(_dt_of_us(-(-wm_ns // 1000)), pa.timestamp("us"))
            f_mask = pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi_f))
            b_mask = pc.and_(
                pc.greater(ts, lo_b)
                if self.dyn_op == ">"
                else pc.greater_equal(ts, lo_b),
                pc.less(ts, hi_b),
            )
        return tbl, ts_us_dt, f_mask, b_mask

    def _group_arrays(self, tbl, ts_us_dt):
        import pyarrow.compute as pc

        out = {}
        for g in self.groups:
            if g.kind == "col":
                out[g.name] = tbl.column(g.col)
            else:
                b = pc.floor_temporal(
                    ts_us_dt, unit=g.gran, week_starts_monday=True
                )
                if g.as_date:
                    import pyarrow as pa

                    b = b.cast(pa.date32())
                elif g.ltz:
                    # UTC session (gated): the aware instants equal the
                    # naive UTC floor — annotate the tz the state carries
                    b = pc.assume_timezone(b, "UTC")
                out[g.name] = b
        return out

    def _partials(self, tbl, garrs, mask) -> Tuple[Dict[tuple, dict], int]:
        """Vectorized partial aggregation of the masked subset →
        {group key tuple: {state col: value}}, plus the raw row count."""
        import pyarrow as pa
        import pyarrow.compute as pc

        # Aggregate over RESERVED internal column names: user aliases and
        # pyarrow's derived '{col}_{fn}' output names can therefore never
        # collide with the group block (e.g. a bucket aliased v_sum
        # alongside sum(v), or count-all vs count-valid over one column
        # both deriving '{col}_count'), making the positional read below
        # unambiguous.
        g_int = [f"__qc_g{i}" for i in range(len(self.groups))]
        src_int: Dict[str, str] = {}
        cols: Dict[str, object] = {}
        for gi, g in zip(g_int, self.groups):
            cols[gi] = garrs[g.name]
            src_int.setdefault(g.name, gi)
        for r in self.recipes:
            if r.src in src_int:
                continue
            nm = f"__qc_a{len(src_int)}"
            src_int[r.src] = nm
            if r.derive is not None:
                arr = r.derive(tbl)
                if r.src.startswith("__qc_f64_"):
                    arr = pc.cast(arr, pa.float64())
                cols[nm] = arr
            elif r.src.startswith("__qc_f64_"):
                cols[nm] = pc.cast(
                    tbl.column(r.src[len("__qc_f64_"):]), pa.float64()
                )
            else:
                cols[nm] = tbl.column(r.src)
        for c in self.nan_check:
            arr = cols[src_int[c]]
            if pa.types.is_floating(arr.type) and tbl.num_rows and \
                    pc.any(pc.is_nan(pc.fill_null(arr, 0.0))).as_py():
                raise NanoUnsupported("NaN under min/max (ordering differs)")
        work = pa.table(cols).filter(mask)
        n = work.num_rows
        if n == 0:
            return {}, 0
        aggs, outs = [], []
        seen = set()
        for r in self.recipes:
            key = (r.src, r.fn, r.mode)
            if key in seen:
                continue
            seen.add(key)
            if r.fn == "count":
                aggs.append(
                    (src_int[r.src], "count", pc.CountOptions(mode=r.mode))
                )
            else:
                aggs.append((src_int[r.src], r.fn))
            outs.append(key)
        res = work.group_by(g_int).aggregate(aggs)
        # column layout varies across pyarrow versions (keys first vs
        # aggregates first); the reserved names identify the group block
        # exactly, and the aggregate block is positional in aggs order
        ng, na = len(g_int), len(outs)
        if res.num_columns != ng + na:
            raise NanoUnsupported("unexpected pyarrow aggregate layout")
        if res.column_names[:ng] == g_int:
            key_cols, agg_cols = res.columns[:ng], res.columns[ng:]
        elif res.column_names[na:] == g_int:
            key_cols, agg_cols = res.columns[na:], res.columns[:na]
        else:
            raise NanoUnsupported("unexpected pyarrow aggregate layout")
        agg_vals = [c.to_pylist() for c in agg_cols]
        key_vals = [c.to_pylist() for c in key_cols]
        pos_by_key = {key: i for i, key in enumerate(outs)}
        parts: Dict[tuple, dict] = {}
        for i in range(res.num_rows):
            k = tuple(kv[i] for kv in key_vals)
            st = {}
            for r in self.recipes:
                v = agg_vals[pos_by_key[(r.src, r.fn, r.mode)]][i]
                st[r.state_col] = r.post(v, st) if r.post is not None else v
            parts[k] = st
        return parts, n

    def run(self, wm_ns: int, now_ns: int, jvm_eval=None):
        """One refresh: returns (fresh_parts, bnd_parts, boundary,
        fresh_rows, bound). Pure driver-side — no Spark job. In static
        mode there is no bound/boundary: only the fresh window scans and
        bnd_parts/boundary/bound come back empty."""
        if self.static:
            tbl, ts_us_dt, f_mask, _ = self._scan(wm_ns, now_ns, 0, 0)
            garrs = self._group_arrays(tbl, ts_us_dt)
            fresh, fresh_rows = self._partials(tbl, garrs, f_mask)
            return fresh, {}, None, fresh_rows, None

        if self.rhs_python:
            bound_dt = eval_bound(self.rhs, now_ns)
        else:
            if jvm_eval is None:
                raise NanoUnsupported("bound needs JVM evaluation")
            bound_dt = jvm_eval()
        bound_us = _us_of(bound_dt)
        bucket = trunc_dt(bound_dt, self.bucket_gran)
        bend_us = _us_of(bucket_end(bucket, self.bucket_gran))
        bhi_us = min(-(-now_ns // 1000), bend_us)

        tbl, ts_us_dt, f_mask, b_mask = self._scan(
            wm_ns, now_ns, bound_us, bhi_us
        )
        garrs = self._group_arrays(tbl, ts_us_dt)
        fresh, fresh_rows = self._partials(tbl, garrs, f_mask)
        bnd, _ = self._partials(tbl, garrs, b_mask)
        boundary = bucket.date() if self.bucket_is_date else bucket
        return fresh, bnd, boundary, fresh_rows, bound_dt


def build_nano_program(
    table: str,
    ts_col: str,
    state_group,
    plans,
    bucket_name: Optional[str],
    bucket_gran: Optional[str],
    dyn_op: str,
    rhs: Optional[Expr],
    bucket_is_date: bool,
    max_bytes: int,
    pred_expr: Optional[Expr] = None,
    group_ltz: Optional[set] = None,
    static: bool = False,
    join_steps=(),
) -> NanoProgram:
    """Build (and validate admission for) the nano program; raises
    NanoUnsupported on any contract violation. ``static=True`` builds the
    fresh-window-only variant (no dynamic bound/boundary). Left-deep
    equi-joins against OTHER registered sources are admitted when every
    table fits the shared byte budget — the dims load and join
    driver-side per refresh (the broadcast-join analogue)."""
    from .sources.tables import LOCAL_PARQUET_SOURCES

    def _src_of(name: str):
        s = LOCAL_PARQUET_SOURCES.get(name)
        if s is None:
            raise NanoUnsupported(f"table {name} not a registered local source")
        p = s["path"]
        if not os.path.exists(p):
            raise NanoUnsupported(f"source path gone: {p}")
        return s

    src = _src_of(table)
    ts_kind = src["ts_kinds"].get(ts_col)
    if ts_kind is None:
        raise NanoUnsupported(f"{ts_col} not a normalized temporal column")
    path = src["path"]
    dim_paths = []
    for step in join_steps:
        if step.on is None or step.how not in ("inner", "left"):
            raise NanoUnsupported(f"join shape {step.how} not admitted")
        dim_paths.append((step, _src_of(step.table)["path"]))
    size = _source_bytes(path) + sum(_source_bytes(p) for _, p in dim_paths)
    if not max_bytes or size > max_bytes:
        raise NanoUnsupported(
            f"sources {size} bytes over nano_refresh_max_bytes={max_bytes}"
        )
    groups = [_parse_group(g, ts_col) for g in state_group]
    for g in groups:
        # group key cols must not collide with the shadow-normalized names
        if g.kind == "col" and g.col.endswith("_ns"):
            raise NanoUnsupported("grouping on a derived shadow column")
        if g.kind == "trunc" and g.name in (group_ltz or set()):
            g.ltz = True
    recipes, nan_check = _parse_aggs(plans, ts_col)
    pred_fn, pred_cols = (None, set())
    if pred_expr is not None:
        pred_fn, pred_cols = _parse_pred(pred_expr)

    fact_columns: Optional[List[str]] = None
    dims: Optional[List[_DimJoin]] = None
    if dim_paths:
        fact_columns, dims = _resolve_join_columns(
            path, ts_col, dim_paths, groups, recipes, pred_cols
        )

    gran = ""
    rhs_python = False
    if not static:
        gran = _TRUNC_ALIASES.get(bucket_gran.lower(), bucket_gran.lower())
        if gran not in ("minute", "hour", "day", "week", "month", "quarter",
                        "year"):
            raise NanoUnsupported(f"bucket granularity {bucket_gran}")
        rhs_python = True
        try:
            validate_bound_expr(rhs)
        except NanoUnsupported:
            rhs_python = False
    return NanoProgram(
        path, ts_col, ts_kind, groups, recipes, nan_check, gran, dyn_op,
        rhs, rhs_python, bucket_is_date, pred_fn=pred_fn,
        pred_cols=pred_cols, static=static, fact_columns=fact_columns,
        dims=dims,
    )


def _resolve_join_columns(
    fact_path: str,
    ts_col: str,
    dim_paths,
    groups,
    recipes,
    pred_cols: set,
):
    """Assign every needed column (and join key) to its owning table.

    Ownership must be UNIQUE across the fact and all joined dims — an
    ambiguous name would silently read the wrong side, so it rejects.
    Join keys must connect the accumulated left side to the new right
    table (left-deep), mirroring how the SQL planner resolved them."""
    import pyarrow.parquet as pq

    def _schema_names(p: str) -> set:
        if os.path.isfile(p):
            return set(pq.read_schema(p).names)
        for r, _, fs in os.walk(p):
            for f in fs:
                if f.endswith(".parquet"):
                    return set(pq.read_schema(os.path.join(r, f)).names)
        raise NanoUnsupported(f"no parquet files under {p}")

    tables = [("__fact__", fact_path, _schema_names(fact_path))]
    for step, p in dim_paths:
        tables.append((step.table, p, _schema_names(p)))

    def owner(col: str) -> int:
        hits = [i for i, (_, _, names) in enumerate(tables) if col in names]
        if len(hits) != 1:
            raise NanoUnsupported(
                f"column {col} owned by {len(hits)} tables (need exactly 1)"
            )
        return hits[0]

    need = {ts_col}
    need.update(g.col for g in groups)
    need.update(pred_cols)
    for r in recipes:
        need.update(_recipe_cols(r))
    per_table: List[set] = [set() for _ in tables]
    for c in need:
        per_table[owner(c)].add(c)

    dims: List[_DimJoin] = []
    left_tables = {0}
    for i, (step, p) in enumerate(dim_paths, start=1):
        on = step.on
        if not (
            isinstance(on, BinOp)
            and on.op == "="
            and isinstance(on.left, Col)
            and isinstance(on.right, Col)
        ):
            raise NanoUnsupported(f"join condition {on!r}")
        a, b = owner(on.left.name), owner(on.right.name)
        if a in left_tables and b == i:
            lk, rk = on.left.name, on.right.name
        elif b in left_tables and a == i:
            lk, rk = on.right.name, on.left.name
        else:
            raise NanoUnsupported("join keys do not connect left to right")
        per_table[owner(lk)].add(lk)
        per_table[i].add(rk)
        left_tables.add(i)
        dims.append(
            _DimJoin(
                step.table, p,
                "inner" if step.how == "inner" else "left outer",
                lk, rk, [],  # columns filled after all keys are known
            )
        )
    for i, d in enumerate(dims, start=1):
        d.columns = sorted(per_table[i])
    return sorted(per_table[0]), dims


class NanoTopKProgram:
    """Driver-side refresh for the MAINTAINED TOP-K filter query (the
    reference's simple-filter-caching roadmap box, ``README.md:130``, with
    ORDER BY + LIMIT): state is ≤k rows, the fresh tail is byte-gated, so
    ``topk(state ∪ fresh)`` is a pure pyarrow scan + sort — zero Spark
    jobs. The same admission contract as :class:`NanoProgram`: only
    sources registered through ``register_parquet_view``, pinned dataset
    handles, per-file drift signature, exact window/predicate mirrors.

    At 100 TB the byte gate self-bypasses and the distributed path (one
    fresh-tail Spark job merging k state rows) serves instead — this tier
    exists because at SMALL fresh-tail sizes two Spark jobs per refresh
    cost more than the scan itself.
    """

    #: sortable-by-pyarrow-with-Spark-identical-ordering column types
    _ORDERABLE = (
        "is_integer", "is_floating", "is_decimal", "is_string",
        "is_large_string", "is_boolean", "is_timestamp", "is_date",
    )

    def __init__(
        self,
        path: str,
        ts_col: str,
        ts_kind: str,
        projection,  # [(out_name, source_col)]
        pred_fn,
        pred_cols,
        sort_spec,  # [(out_name, ascending, nulls_first)] — Spark-effective
        limit: int,
    ):
        import pyarrow as pa
        import pyarrow.dataset as pds

        self.path = path
        self.ts_col = ts_col
        self.ts_kind = ts_kind
        self.projection = list(projection)
        self.pred_fn = pred_fn
        self.sort_spec = list(sort_spec)
        self.limit = limit
        self.dims = []
        self._dim_ds = []
        self._ds = pds.dataset(path, format="parquet")
        self._src_sig = self._stat_sig()

        shadow = f"{ts_col}_ns"
        names = set(self._ds.schema.names)
        if len({n for n, _ in self.projection}) != len(self.projection):
            raise NanoUnsupported("duplicate output names")
        scan = {ts_col}
        self.derive = {}  # out name -> "ts" | "shadow" | None
        for out, src in self.projection:
            if src == shadow:
                self.derive[out] = "shadow"
            elif src == ts_col:
                self.derive[out] = "ts"
            elif src in names:
                self.derive[out] = None
                scan.add(src)
            else:
                raise NanoUnsupported(f"column {src} not in parquet files")
        for c in pred_cols:
            if c in (ts_col, shadow):
                raise NanoUnsupported("predicate on the temporal axis")
            if c not in names:
                raise NanoUnsupported(f"predicate column {c} not in parquet files")
            scan.add(c)
        self.scan_columns = sorted(scan)

        ftype = self._ds.schema.field(ts_col).type
        want_unit = "ns" if ts_kind == "ns_long" else "us"
        if not (
            pa.types.is_timestamp(ftype)
            and ftype.unit == want_unit
            and ftype.tz is None
        ):
            raise NanoUnsupported(f"{ts_col} parquet type {ftype}")

        out_src = dict(self.projection)
        for name, _asc, _nf in self.sort_spec:
            src = out_src.get(name)
            if src is None:
                raise NanoUnsupported(f"sort column {name} not in output")
            if self.derive[name] == "ts":
                continue  # derived µs timestamp — orderable
            if self.derive[name] == "shadow":
                continue  # epoch-ns long — orderable
            t = self._ds.schema.field(src).type
            if not any(getattr(pa.types, chk)(t) for chk in self._ORDERABLE):
                raise NanoUnsupported(f"sort column type {t} not mirrored")

    _stat_sig = NanoProgram._stat_sig
    validate = NanoProgram.validate

    def refresh(self, state_tbl, wm_ns: int, now_ns: int):
        """topk(state ∪ fresh[wm, now)) as a pyarrow Table in the state
        schema. Window bounds mirror ``_push_time_bounds`` exactly: the
        ns range is binding (ns-long sources read raw ns; µs sources
        reduce it to ceil-µs bounds)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pds

        f = pds.field(self.ts_col)
        if self.ts_kind == "ns_long":
            lo_f = pa.scalar(wm_ns, pa.timestamp("ns"))
            hi_f = pa.scalar(now_ns, pa.timestamp("ns"))
        else:
            lo_f = pa.scalar(_dt_of_us(-(-wm_ns // 1000)), pa.timestamp("us"))
            hi_f = pa.scalar(_dt_of_us(-(-now_ns // 1000)), pa.timestamp("us"))
        tbl = self._ds.to_table(
            columns=self.scan_columns, filter=(f >= lo_f) & (f < hi_f)
        )
        if self.pred_fn is not None:
            tbl = tbl.filter(self.pred_fn(tbl))

        ts_us = ns = None
        if any(self.derive[n] for n, _ in self.projection):
            raw = tbl.column(self.ts_col).combine_chunks()
            if self.ts_kind == "ns_long":
                ns = pc.cast(raw, pa.int64())
                if tbl.num_rows and pc.min(ns).as_py() < 0:
                    # `div 1000` truncates toward zero; pre-1970 values
                    # break the trunc≡floor equivalence the mirror needs
                    raise NanoUnsupported("negative epoch in ns source")
                ts_us = pc.cast(pc.divide(ns, 1000), pa.timestamp("us"))
            else:
                ts_us = raw
                ns = pc.multiply(pc.cast(raw, pa.int64()), 1000)
        arrays, names = [], []
        for out, src in self.projection:
            kind = self.derive[out]
            if kind == "ts":
                arrays.append(ts_us)
            elif kind == "shadow":
                arrays.append(ns)
            else:
                arrays.append(tbl.column(src))
            names.append(out)
        fresh = pa.Table.from_arrays(
            [pa.chunked_array([a]) if isinstance(a, pa.Array) else a
             for a in arrays],
            names=names,
        ).cast(state_tbl.schema)
        merged = pa.concat_tables([state_tbl, fresh])

        # Spark orders NaN ABOVE all numbers; pyarrow's placement differs —
        # state is k rows and fresh is byte-gated, so the guard is cheap
        for name, _asc, _nf in self.sort_spec:
            col = merged.column(name)
            if (
                pa.types.is_floating(col.type)
                and merged.num_rows
                and pc.any(pc.is_nan(pc.fill_null(col, 0.0))).as_py()
            ):
                raise NanoUnsupported("NaN in sort column (ordering differs)")

        # per-key NULLS FIRST/LAST via helper is-null keys: pyarrow's
        # null_placement is global, Spark's is per ORDER BY item
        work = merged
        sort_keys = []
        for i, (name, asc, nulls_first) in enumerate(self.sort_spec):
            h = f"__qc_n{i}"
            work = work.append_column(
                h, pc.cast(pc.is_null(merged.column(name)), pa.int8())
            )
            sort_keys.append((h, "descending" if nulls_first else "ascending"))
            sort_keys.append((name, "ascending" if asc else "descending"))
        idx = pc.sort_indices(work, sort_keys=sort_keys)
        if len(idx) > self.limit:
            idx = idx.slice(0, self.limit)
        return merged.take(idx)


#: maintained-k cap for the driver tier: above this the per-refresh driver
#: sort stops being trivially cheap and the distributed path should serve
NANO_TOPK_MAX_K = 100_000


def build_nano_topk_program(
    table: str,
    ts_col: str,
    projection,
    pred_expr: Optional[Expr],
    sort_spec,
    limit: int,
    max_bytes: int,
) -> NanoTopKProgram:
    """Build (and validate admission for) the driver top-k program; raises
    NanoUnsupported on any contract violation."""
    from .sources.tables import LOCAL_PARQUET_SOURCES

    if not limit or limit > NANO_TOPK_MAX_K:
        raise NanoUnsupported(f"limit {limit} over driver top-k cap")
    src = LOCAL_PARQUET_SOURCES.get(table)
    if src is None:
        raise NanoUnsupported(f"table {table} not a registered local source")
    path = src["path"]
    if not os.path.exists(path):
        raise NanoUnsupported(f"source path gone: {path}")
    ts_kind = src["ts_kinds"].get(ts_col)
    if ts_kind is None:
        raise NanoUnsupported(f"{ts_col} not a normalized temporal column")
    size = _source_bytes(path)
    if not max_bytes or size > max_bytes:
        raise NanoUnsupported(
            f"source {size} bytes over nano_refresh_max_bytes={max_bytes}"
        )
    pred_fn, pred_cols = (None, set())
    if pred_expr is not None:
        pred_fn, pred_cols = _parse_pred(pred_expr)
    return NanoTopKProgram(
        path, ts_col, ts_kind, projection, pred_fn, pred_cols, sort_spec,
        limit,
    )

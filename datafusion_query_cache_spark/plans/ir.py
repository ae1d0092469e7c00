"""Mini-IR for cacheable aggregate queries.

The reference wraps a matched ``LogicalPlan::Aggregate`` in a custom extension
node (``QCAggregatePlanNode``, reference ``src/aggregate.rs:215-315``).  We
never get to touch Catalyst from PySpark, so the equivalent object here is a
plain Python dataclass tree produced *before* anything is handed to Spark:
``AggSpec`` is the analogue of the reference's extension node, and ``Expr``
subclasses are the analogue of DataFusion's ``Expr`` enum as far as the
cache-eligibility analyzer needs to see them (reference ``src/aggregate.rs:692-809``).

Everything that does not parse into this IR is passed through to
``spark.sql`` untouched — exactly the reference's ``Transformed::no`` path
(``src/aggregate.rs:85-88``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator, Optional, Tuple


class Expr:
    """Base expression node. Frozen dataclasses → hashable, repr-stable."""

    def children(self) -> Tuple["Expr", ...]:
        return ()

    def walk(self) -> Iterator["Expr"]:
        yield self
        for c in self.children():
            yield from c.walk()


@dataclass(frozen=True)
class Col(Expr):
    name: str

    def canon(self) -> str:
        return f"col({self.name})"


@dataclass(frozen=True)
class Lit(Expr):
    value: Any
    dtype: Optional[str] = None  # duckdb logical type id, e.g. VARCHAR, INTEGER

    def canon(self) -> str:
        return f"lit({self.value!r}:{self.dtype})"


@dataclass(frozen=True)
class Star(Expr):
    """count(*) argument."""

    def canon(self) -> str:
        return "*"


@dataclass(frozen=True)
class BinOp(Expr):
    """op in {and, or, =, !=, >, >=, <, <=, +, -, *, /, %, like, not_like}."""

    op: str
    left: Expr
    right: Expr

    def children(self) -> Tuple[Expr, ...]:
        return (self.left, self.right)

    def canon(self) -> str:
        return f"({self.left.canon()} {self.op} {self.right.canon()})"


@dataclass(frozen=True)
class Not(Expr):
    child: Expr

    def children(self) -> Tuple[Expr, ...]:
        return (self.child,)

    def canon(self) -> str:
        return f"not({self.child.canon()})"


@dataclass(frozen=True)
class Neg(Expr):
    child: Expr

    def children(self) -> Tuple[Expr, ...]:
        return (self.child,)

    def canon(self) -> str:
        return f"neg({self.child.canon()})"


@dataclass(frozen=True)
class IsNull(Expr):
    child: Expr
    negated: bool = False

    def children(self) -> Tuple[Expr, ...]:
        return (self.child,)

    def canon(self) -> str:
        return f"isnull({self.child.canon()},neg={self.negated})"


@dataclass(frozen=True)
class Cast(Expr):
    child: Expr
    to_type: str  # duckdb type id string (TIMESTAMP, DOUBLE, ...)

    def children(self) -> Tuple[Expr, ...]:
        return (self.child,)

    def canon(self) -> str:
        return f"cast({self.child.canon()} as {self.to_type})"


@dataclass(frozen=True)
class Func(Expr):
    """Scalar function call (non-aggregate): round, date_trunc, now, ..."""

    name: str
    args: Tuple[Expr, ...] = ()

    def children(self) -> Tuple[Expr, ...]:
        return self.args

    def canon(self) -> str:
        return f"{self.name}({','.join(a.canon() for a in self.args)})"


@dataclass(frozen=True)
class AggCall(Expr):
    """Aggregate function call: count/sum/min/max/avg/...

    ``distinct`` mirrors DataFusion's AggregateFunction.distinct; a distinct
    aggregate has no mergeable decomposition (SURVEY §4.3) so the classifier
    abandons it unless it is an opt-in sketch aggregate.
    """

    fn: str
    args: Tuple[Expr, ...] = ()
    distinct: bool = False

    def children(self) -> Tuple[Expr, ...]:
        return self.args

    def canon(self) -> str:
        d = "distinct " if self.distinct else ""
        return f"{self.fn}({d}{','.join(a.canon() for a in self.args)})"


@dataclass(frozen=True)
class Case(Expr):
    """CASE WHEN ... simple passthrough-capable expression."""

    whens: Tuple[Tuple[Expr, Expr], ...]
    otherwise: Optional[Expr] = None

    def children(self) -> Tuple[Expr, ...]:
        out = []
        for c, v in self.whens:
            out.append(c)
            out.append(v)
        if self.otherwise is not None:
            out.append(self.otherwise)
        return tuple(out)

    def canon(self) -> str:
        parts = ",".join(f"when {c.canon()} then {v.canon()}" for c, v in self.whens)
        o = f" else {self.otherwise.canon()}" if self.otherwise is not None else ""
        return f"case({parts}{o})"


@dataclass(frozen=True)
class InList(Expr):
    child: Expr
    values: Tuple[Expr, ...]
    negated: bool = False

    def children(self) -> Tuple[Expr, ...]:
        return (self.child,) + self.values

    def canon(self) -> str:
        n = "not in" if self.negated else "in"
        return f"({self.child.canon()} {n} ({','.join(v.canon() for v in self.values)}))"


def transform(e: Expr, f) -> Expr:
    """Bottom-up structural rewrite: rebuild ``e`` with every child passed
    through :func:`transform`, then apply ``f`` to the rebuilt node. Frozen
    dataclasses → rebuilds are pure; unchanged subtrees are still rebuilt
    (cheap — these trees are tiny)."""
    import dataclasses

    def _tx(v):
        if isinstance(v, Expr):
            return transform(v, f)
        if isinstance(v, tuple):
            return tuple(_tx(x) for x in v)
        return v

    kw = {fld.name: _tx(getattr(e, fld.name)) for fld in dataclasses.fields(e)}
    return f(type(e)(**kw))


# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SelectItem:
    """One output column: ``expr AS name``."""

    name: str
    expr: Expr


@dataclass(frozen=True)
class OrderItem:
    expr: Expr
    desc: bool = False
    nulls_first: Optional[bool] = None


@dataclass(frozen=True)
class ScalarSubquery(Expr):
    """``(SELECT <one global aggregate> FROM ...)`` used as a scalar in an
    outer predicate/HAVING (``WHERE v > (SELECT avg(v) FROM t)``).

    The reference's bottom-up rule caches the inner Aggregate wherever it
    sits (``src/aggregate.rs:74-76``) — here the inner global aggregate
    runs through the full cached pipeline at plan time, its single-row
    result is folded into the outer predicate as a literal, and the outer
    query executes as plain Spark ops. Identity/equality/hash use the
    canonical string alone; ``spec`` (the lowered inner AggSpec) rides
    along for the planner."""

    canon_str: str
    spec: object = field(hash=False, compare=False, default=None, repr=False)

    def canon(self) -> str:
        return f"scalarsubq({self.canon_str})"


@dataclass(frozen=True)
class InSubquery(Expr):
    """``x IN (SELECT <one column> FROM … [GROUP BY …] [HAVING …])`` used
    as a boolean in an outer predicate/HAVING.

    Same design as :class:`ScalarSubquery` — the reference's bottom-up
    rule caches the inner Aggregate wherever it sits
    (``src/aggregate.rs:74-76``). The inner aggregate runs through the
    full cached pipeline at plan time; its single output column (bounded
    by ``config.in_subquery_max_values``, else passthrough) folds into the
    outer predicate as an IN-list of literals with exact SQL NULL
    semantics, and the outer query executes as plain Spark ops. Identity/
    equality/hash use ``left`` + the canonical string; ``spec`` rides
    along for the planner. ``NOT IN`` arrives as a NOT operator above this
    node and needs no special casing (the folded expression propagates
    NULLs exactly)."""

    left: Expr
    canon_str: str
    spec: object = field(hash=False, compare=False, default=None, repr=False)
    #: comparison operator: "=" is plain IN (folds to an IN-list);
    #: >, >=, <, <=, != are quantified comparisons (x > ANY(S)) — DuckDB
    #: canonicalizes ALL into NOT(negated-op ANY), so ANY covers both.
    #: Non-= folds build an OR of direct comparisons over the distinct
    #: value set, which reproduces SQL's three-valued quantifier
    #: semantics with no special-casing (OR(TRUE, NULL)=TRUE,
    #: OR(FALSE, NULL)=NULL; empty set → FALSE).
    op: str = "="

    def children(self) -> Tuple[Expr, ...]:
        return (self.left,)

    def canon(self) -> str:
        return f"insubq({self.left.canon()},op={self.op},{self.canon_str})"


@dataclass(frozen=True)
class CorrScalar(Expr):
    """A correlated scalar subquery with a single correlated equality —
    ``(SELECT agg(v) FROM t2 WHERE t2.k = outer.k [AND stable…])`` —
    decorrelated to a broadcast LEFT JOIN against the cached grouped
    rollup ``SELECT k, agg(v) FROM t2 [WHERE stable…] GROUP BY k``.

    The per-key scalar becomes a joined column: absent keys join to NULL,
    which is exactly the empty-correlated-scalar result for NULL-on-empty
    aggregates (sum/avg/min/max/moment families); count-family aggregates
    return 0 on empty, so the session wraps the joined column in
    ``coalesce(…, 0)`` when ``count_like``. The inner rollup is O(groups)
    rows — broadcast-sized by construction at any source scale."""

    #: outer-side key expressions, one per correlated equality (r13:
    #: k conjunctive equalities → composite-key rollup + broadcast join)
    outer_keys: Tuple[Expr, ...] = ()
    #: inner rollup key NAME per equality, parallel to ``outer_keys``
    #: (may repeat when several outer keys equate to one inner column)
    inner_keys: Tuple[str, ...] = ()
    canon_str: str = ""
    spec: object = field(hash=False, compare=False, default=None, repr=False)
    count_like: bool = False

    def children(self) -> Tuple[Expr, ...]:
        return self.outer_keys

    def canon(self) -> str:
        keys = ",".join(k.canon() for k in self.outer_keys)
        return (
            f"corrscalar(({keys}),{self.canon_str},"
            f"cl={self.count_like})"
        )


@dataclass(frozen=True)
class ExistsSubquery(Expr):
    """``[NOT] EXISTS (SELECT <one column> FROM … [GROUP BY …] [HAVING …])``
    used as a boolean in an outer predicate/HAVING — UNCORRELATED only
    (the parser rejects outer references).

    Same design as :class:`InSubquery`, strictly simpler: the inner
    aggregate runs through the full cached pipeline at plan time and the
    fold is a single ``limit(1)`` row-existence probe → a TRUE/FALSE
    literal (EXISTS is never NULL, so there are no three-valued-logic
    cases). ``NOT EXISTS`` arrives as a NOT operator above this node and
    needs no special casing. The reference's bottom-up rule caches the
    inner Aggregate wherever it sits (``src/aggregate.rs:74-76``);
    correlated shapes stay passthrough (``_reject_foreign_qualifiers``)."""

    canon_str: str
    spec: object = field(hash=False, compare=False, default=None, repr=False)

    def canon(self) -> str:
        return f"existssubq({self.canon_str})"


@dataclass(frozen=True)
class WindowExpr(Expr):
    """``fn(args) OVER (PARTITION BY ... ORDER BY ...)`` with the default
    frame (``RANGE UNBOUNDED PRECEDING .. CURRENT ROW`` — identical default
    in DuckDB and Spark, so running aggregates agree between the engine and
    the oracle).

    Window functions are admitted ONLY in the outer select of a derived
    table over a cached aggregate (:class:`SubquerySpec`) — they evaluate
    post-finalize over O(state) rows, so the cached state and fingerprint
    are untouched; the reference's bottom-up rule gets the same shape for
    free because the Window node sits above the rewritten Aggregate
    (``src/aggregate.rs:74-76``). ``fn`` is the lower-cased function name
    (row_number/rank/dense_rank/percent_rank/cume_dist/ntile/lag/lead/
    first_value/last_value, or a plain aggregate sum/avg/min/max/count);
    ``offset``/``default`` carry lag/lead's extra operands.
    """

    fn: str
    args: Tuple[Expr, ...] = ()
    partition_by: Tuple[Expr, ...] = ()
    order_by: Tuple["OrderItem", ...] = ()
    offset: Optional[Expr] = None
    default: Optional[Expr] = None
    #: explicit frame ``(mode, lo, hi)`` in Spark rows/rangeBetween
    #: encoding — mode is "rows" or "range"; ints are offsets from the
    #: current row (value) (negative = preceding), ``None`` = unbounded on
    #: that side; the whole field ``None`` = the shared default frame
    #: (RANGE UNBOUNDED PRECEDING .. CURRENT ROW). ROWS semantics are
    #: identical in DuckDB and Spark given the same ORDER (ties make any
    #: engine's ROWS frames order-dependent — same caveat as plain
    #: Spark); RANGE frames are peer-inclusive and therefore
    #: tie-independent, but require one NUMERIC order key (the session
    #: type-checks and degrades to passthrough otherwise).
    frame: Optional[Tuple[str, Optional[int], Optional[int]]] = None
    #: IGNORE NULLS (first_value/last_value/nth_value only — Spark's
    #: lag/lead lack the form in the Python API)
    ignore_nulls: bool = False

    def children(self) -> Tuple[Expr, ...]:
        out = list(self.args) + list(self.partition_by)
        out.extend(o.expr for o in self.order_by)
        if self.offset is not None:
            out.append(self.offset)
        if self.default is not None:
            out.append(self.default)
        return tuple(out)

    def canon(self) -> str:
        p = ",".join(x.canon() for x in self.partition_by)
        o = ",".join(
            f"{x.expr.canon()}:{'d' if x.desc else 'a'}:{x.nulls_first}"
            for x in self.order_by
        )
        a = ",".join(x.canon() for x in self.args)
        extra = ""
        if self.offset is not None:
            extra += f",off={self.offset.canon()}"
        if self.default is not None:
            extra += f",def={self.default.canon()}"
        f = (
            ""
            if self.frame is None
            else f" {self.frame[0]}[{self.frame[1]},{self.frame[2]}]"
        )
        inn = " ign" if self.ignore_nulls else ""
        return f"win:{self.fn}({a}{extra}) over(p[{p}] o[{o}]{f}{inn})"


@dataclass(frozen=True)
class JoinStep:
    """One step of a left-deep join tree: ``... JOIN table ON cond`` or
    ``... JOIN table USING (cols)`` (``using`` non-empty, ``on`` None —
    the session joins by name-list, which merges the key columns exactly
    like SQL USING)."""

    table: str
    on: Optional[Expr]  # None for CROSS / USING
    how: str  # "inner" | "left" | "full" (composite-planned, r15)
    using: Tuple[str, ...] = ()

    def canon(self) -> str:
        if self.using:
            return f"{self.how}({self.table} using {','.join(self.using)})"
        c = self.on.canon() if self.on is not None else "true"
        return f"{self.how}({self.table} on {c})"


@dataclass
class AggSpec:
    """The analyzed shape of a single-table aggregate query.

    Analogue of the reference's ``QCAggregatePlanNode`` payload
    (``src/aggregate.rs:222-233``: input, fingerprint, temporal column,
    dynamic lower bound), plus everything needed to *rebuild* the query as a
    DataFrame program since we cannot hand a rewritten plan back to Catalyst.
    """

    table: str
    predicate: Optional[Expr]
    group_by: Tuple[SelectItem, ...]  # group exprs with their output names
    aggregates: Tuple[SelectItem, ...]  # agg outputs (scalars-over-aggs allowed)
    select_order: Tuple[str, ...] = ()  # output column order by name
    order_by: Tuple[OrderItem, ...] = ()
    limit: Optional[int] = None
    #: LIMIT … OFFSET n — post-finalize like limit (not in the
    #: fingerprint: pagination pages share one state entry)
    offset: Optional[int] = None
    having: Optional[Expr] = None
    #: all source tables (fact first, then joined dims)
    tables: Tuple[str, ...] = ()
    #: left-deep join steps applied to the fact table, in order
    join_steps: Tuple["JoinStep", ...] = ()
    #: ROLLUP/CUBE/GROUPING SETS: index tuples into group_by; empty ⇒ plain
    grouping_sets: Tuple[Tuple[int, ...], ...] = ()
    #: bare grouping()/grouping_id() select items (reconstructed per set)
    grouping_fn_items: Tuple[SelectItem, ...] = ()

    def canon(self) -> str:
        """Canonical plan string — the fingerprint body.

        The reference fingerprints ``plan.display_indent_schema()``
        (``src/aggregate.rs:89``); ours is the canonical IR serialization,
        deliberately *not* a Spark plan string so it is stable across Spark
        versions (SURVEY §7 hard-part 2). Schema is appended by the caller.
        """
        gb = ";".join(f"{s.name}={s.expr.canon()}" for s in self.group_by)
        ag = ";".join(f"{s.name}={s.expr.canon()}" for s in self.aggregates)
        pred = canon_predicate(self.predicate)
        tbls = ",".join(self.tables or (self.table,))
        js = ";".join(j.canon() for j in self.join_steps)
        gs = ";".join(",".join(map(str, t)) for t in self.grouping_sets)
        return (
            f"Aggregate[table={tbls}|joins=[{js}]|where={pred}"
            f"|group=[{gb}]|sets=[{gs}]|agg=[{ag}]]"
        )


def canon_predicate(pred: Optional[Expr]) -> str:
    """Canonical predicate string with AND-conjuncts sorted — `a>1 AND b=2`
    and `b=2 AND a>1` fingerprint to the same cache entry. (The reference's
    plan-string fingerprint does not normalize this; strict improvement —
    AND is commutative, so semantics are unchanged.)"""
    if pred is None:
        return "true"

    def flatten(e: Expr) -> list:
        if isinstance(e, BinOp) and e.op == "and":
            return flatten(e.left) + flatten(e.right)
        return [e]

    parts = sorted(c.canon() for c in flatten(pred))
    return " and ".join(parts) if len(parts) > 1 else parts[0]


@dataclass
class FilterSpec:
    """A single-table non-aggregate query: ``SELECT cols FROM t WHERE pred``.

    The reference lists simple filter queries as unimplemented
    (``README.md:130``); we cache them as incrementally-appended row sets
    (or an incrementally-maintained top-k when ORDER BY + LIMIT present).
    ``items=None`` means ``SELECT *``.
    """

    table: str
    predicate: Optional[Expr]
    items: Optional[Tuple[SelectItem, ...]]
    order_by: Tuple[OrderItem, ...] = ()
    limit: Optional[int] = None

    def canon(self) -> str:
        sel = (
            "*"
            if self.items is None
            else ";".join(f"{s.name}={s.expr.canon()}" for s in self.items)
        )
        pred = canon_predicate(self.predicate)
        # null order is part of the identity: for maintained top-k it decides
        # WHICH rows are retained in state, so NULLS FIRST/LAST variants must
        # not share a cache entry ('-' = engine default).
        ob = ";".join(
            f"{o.expr.canon()}:{'d' if o.desc else 'a'}"
            f":{'-' if o.nulls_first is None else ('nf' if o.nulls_first else 'nl')}"
            for o in self.order_by
        )
        lim = str(self.limit) if self.limit is not None else "-"
        return f"Filter[table={self.table}|where={pred}|select=[{sel}]|order=[{ob}]|limit={lim}]"


@dataclass
class SubquerySpec:
    """An aggregate inside a derived table, plus the outer shape applied to
    its result: ``SELECT <items> FROM (<inner aggregate>) x [WHERE pred]
    [ORDER BY ...] [LIMIT n]``.

    The reference's bottom-up optimizer rule caches the inner Aggregate
    node wherever it sits in the plan (``src/aggregate.rs:74-76``,
    ``README.md:124``); our SQL front-end gets the same effect by lowering
    the derived table to its :class:`AggSpec` — the CACHE KEY is the inner
    aggregate alone, so a dashboard rollup and every outer shape built on
    it share one state entry — and replaying the outer shape as O(state)
    DataFrame ops on the finalized result.

    ``items=None`` means ``SELECT *`` (all inner outputs). When
    ``aggregates`` is non-empty the outer shape is itself an aggregation
    (``SELECT g, sum(n) FROM (...) GROUP BY g`` — the two-level rollup):
    it runs as PLAIN Spark aggregation over the finalized inner rows
    (O(state), exact), with ``group_by``/``having``/``select_order``
    mirroring AggSpec's fields and ``items`` unused.
    """

    inner: "AggSpec"
    items: Optional[Tuple[SelectItem, ...]]
    predicate: Optional[Expr]
    order_by: Tuple[OrderItem, ...] = ()
    limit: Optional[int] = None
    group_by: Tuple[SelectItem, ...] = ()
    aggregates: Tuple[SelectItem, ...] = ()
    having: Optional[Expr] = None
    select_order: Tuple[str, ...] = ()
    #: dimension tables joined onto the DERIVED RESULT (post-finalize):
    #: ``SELECT ... FROM (<aggregate>) x JOIN dim ON ... [JOIN ...]`` — the
    #: rollup-joined-back-to-labels dashboard shape. The joins replay as
    #: plain O(state)-row joins each read; only the inner aggregate is
    #: cached. Dims are read fresh, so label changes show up immediately.
    join_steps: Tuple[JoinStep, ...] = ()
    #: QUALIFY predicate (DuckDB extension; Spark has no QUALIFY, so this
    #: surface is capability beyond passthrough): filters rows AFTER
    #: window evaluation, before ORDER/LIMIT. May reference item aliases
    #: and inline window expressions; replayed post-finalize like the
    #: windows themselves.
    qualify: Optional[Expr] = None


@dataclass
class UnionSpec:
    """``<branch> UNION [ALL] <branch> [...] [ORDER BY] [LIMIT]`` — or the
    binary ``EXCEPT [ALL]`` / ``INTERSECT [ALL]`` (``op``) — where every
    branch is independently cacheable (AggSpec / SubquerySpec /
    FilterSpec).

    Each branch plans through its own cached pipeline — a dashboard that
    unions this-period vs prior-period rollups gets each leg served
    incrementally from its own entry. The set operation itself, optional
    DISTINCT (``all=False``), and the outer ORDER/LIMIT are plain ops over
    the finalized branch results. SQL set ops are positional: columns take
    the FIRST branch's names; ``ORDER BY`` resolves positions/names
    against them. Any uncacheable branch aborts the whole thing to
    passthrough (the branch planners raise Unsupported), which keeps
    semantics exact. EXCEPT/INTERSECT compare finalized VALUES across
    branches, so (exactly like UNION DISTINCT) float aggregates that
    re-associate under incremental merge can flip membership by a ULP —
    same caveat as any engine that merges partial sums.
    """

    branches: Tuple[object, ...]
    all: bool
    order_by: Tuple[OrderItem, ...] = ()
    limit: Optional[int] = None
    #: "union" (n-ary) | "except" | "intersect" (binary)
    op: str = "union"
    #: LIMIT … OFFSET over the set operation (post-finalize pagination)
    offset: Optional[int] = None


class Unsupported(Exception):
    """Query shape outside the mini-IR → run as plain spark.sql passthrough."""


# -- IR (de)serialization ----------------------------------------------------
# A durable shared cache needs STRUCTURED spec metadata (e.g. the filter
# predicate for semantic subsumption) readable by a different process, so
# the IR round-trips through plain JSON. Type tags name the dataclass;
# Decimal/date/datetime literal values get their own tags.

_IR_CLASSES = {}


def _ir_classes():
    if not _IR_CLASSES:
        for cls in (
            Col, Lit, Star, BinOp, Not, Neg, IsNull, Cast, Func, AggCall,
            Case, InList, SelectItem, OrderItem, JoinStep, WindowExpr,
            FilterSpec, AggSpec,
        ):
            _IR_CLASSES[cls.__name__] = cls
    return _IR_CLASSES


def ir_to_json(node):
    """IR node / tuple / scalar → JSON-safe structure."""
    import dataclasses
    import datetime as _dt
    import decimal as _decimal

    if node is None or isinstance(node, (bool, int, float, str)):
        return node
    if isinstance(node, _decimal.Decimal):
        return {"__dec__": str(node)}
    if isinstance(node, _dt.datetime):
        return {"__dt__": node.isoformat()}
    if isinstance(node, _dt.date):
        return {"__d__": node.isoformat()}
    if isinstance(node, tuple):
        return {"__tuple__": [ir_to_json(x) for x in node]}
    if dataclasses.is_dataclass(node):
        out = {"__ir__": type(node).__name__}
        for fld in dataclasses.fields(node):
            out[fld.name] = ir_to_json(getattr(node, fld.name))
        return out
    raise TypeError(f"cannot serialize {type(node).__name__}")


def ir_from_json(data):
    import datetime as _dt
    import decimal as _decimal

    if data is None or isinstance(data, (bool, int, float, str)):
        return data
    if isinstance(data, list):  # only appears inside __tuple__
        return tuple(ir_from_json(x) for x in data)
    if "__dec__" in data:
        return _decimal.Decimal(data["__dec__"])
    if "__dt__" in data:
        return _dt.datetime.fromisoformat(data["__dt__"])
    if "__d__" in data:
        return _dt.date.fromisoformat(data["__d__"])
    if "__tuple__" in data:
        return tuple(ir_from_json(x) for x in data["__tuple__"])
    cls = _ir_classes()[data["__ir__"]]
    kw = {k: ir_from_json(v) for k, v in data.items() if k != "__ir__"}
    return cls(**kw)

"""Fluent Path API — the primary query surface.

Python re-expression of the reference's ``query/path`` morphism stack
(/root/reference/query/path/path.go:71-75: each call appends an
immutable (Apply, Reversal) pair; folding the stack over AllNodes
yields the shape IR, path.go:567-577). Method names follow the Gizmo
surface (query/gizmo/traversals.go) in snake_case; `PascalCase` aliases
are provided for gizmo-corpus parity.

A Path is store-independent until execution; ``.shape()`` folds the ops
into a shapes.Shape, the compiler lowers it to a DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .. import shapes as S
from ..plans.compiler import compile_nodes, tags_of
from ..store import GraphStore
from ..values import Value, coerce


def _vals(vs) -> tuple[Value, ...]:
    return tuple(coerce(v) for v in vs)


@dataclass(frozen=True)
class _Ctx:
    """Fold context: label constraint for subsequent traversals
    (LabelContext semantics, reference query/path/path.go:52-61)."""

    labels: tuple[Value, ...] | None = None


class _Op:
    def apply(self, shape: S.Shape, ctx: _Ctx) -> tuple[S.Shape, _Ctx]:
        raise NotImplementedError

    def reversed(self) -> "_Op":
        raise NotImplementedError(
            f"{type(self).__name__} is not reversible (FollowReverse)"
        )


def _pred_shape(preds) -> S.Shape | None:
    """Predicate spec → shape: tuple of values → Fixed; a Path (the
    reference's via-path form, e.g. ``.Out(p.V(...).Out(...))``) →
    its folded shape; None → unconstrained."""
    if preds is None:
        return None
    if isinstance(preds, Path):
        return preds.shape()
    return S.Fixed(preds)


def _hop(shape, preds, ctx, start, goal, pred_tags=()):
    """One traversal hop: from nodes via preds to neighbors —
    HasA(goal) ∘ LinksTo(start) (reference query/shape/path.go:59-95)."""
    filters = [S.QuadFilter(start, shape)]
    ps = _pred_shape(preds)
    if ps is not None:
        filters.append(S.QuadFilter(S.PREDICATE, ps))
    if ctx.labels is not None:
        filters.append(S.QuadFilter(S.LABEL, S.Fixed(ctx.labels)))
    save = tuple((S.PREDICATE, t) for t in pred_tags)
    return S.NodesFrom(goal, S.Quads(tuple(filters), save))


@dataclass(frozen=True)
class _Is(_Op):
    values: tuple[Value, ...]

    def apply(self, shape, ctx):
        # Always intersect (never substitute): membership in the store
        # must be verified — g.V("<missing>") is empty (pathtest
        # "find non-existent"). The compiler folds this to a literal
        # predicate when used as a quad constraint (_as_fixed).
        return S.Intersect((shape, S.Fixed(self.values))), ctx

    def reversed(self):
        return self


@dataclass(frozen=True)
class _Out(_Op):
    preds: tuple[Value, ...] | None
    pred_tags: tuple[str, ...] = ()
    rev: bool = False

    def apply(self, shape, ctx):
        start, goal = (S.OBJECT, S.SUBJECT) if self.rev else (S.SUBJECT, S.OBJECT)
        return _hop(shape, self.preds, ctx, start, goal, self.pred_tags), ctx

    def reversed(self):
        return replace(self, rev=not self.rev)


@dataclass(frozen=True)
class _Both(_Op):
    preds: tuple[Value, ...] | None
    pred_tags: tuple[str, ...] = ()

    def apply(self, shape, ctx):
        o = _hop(shape, self.preds, ctx, S.SUBJECT, S.OBJECT, self.pred_tags)
        i = _hop(shape, self.preds, ctx, S.OBJECT, S.SUBJECT, self.pred_tags)
        return S.Union((o, i)), ctx

    def reversed(self):
        return self


@dataclass(frozen=True)
class _Has(_Op):
    preds: tuple[Value, ...] | None
    values: tuple[Value, ...]
    filters: tuple[S.ValueFilter, ...] = ()
    rev: bool = False

    def apply(self, shape, ctx):
        start, goal = (S.OBJECT, S.SUBJECT) if self.rev else (S.SUBJECT, S.OBJECT)
        if self.filters:
            target: S.Shape = S.Filter(S.AllNodes(), self.filters)
        elif self.values:
            target = S.Fixed(self.values)
        else:
            target = S.AllNodes()
        filters = [S.QuadFilter(goal, target)]
        if self.preds is not None:
            filters.append(S.QuadFilter(S.PREDICATE, S.Fixed(self.preds)))
        if ctx.labels is not None:
            filters.append(S.QuadFilter(S.LABEL, S.Fixed(ctx.labels)))
        constraint = S.NodesFrom(start, S.Quads(tuple(filters)))
        return S.Intersect((shape, constraint)), ctx

    def reversed(self):
        return self


@dataclass(frozen=True)
class _Save(_Op):
    preds: tuple[Value, ...]
    tag: str
    rev: bool = False
    optional: bool = False

    def apply(self, shape, ctx):
        start, goal = (S.OBJECT, S.SUBJECT) if self.rev else (S.SUBJECT, S.OBJECT)
        filters = [S.QuadFilter(S.PREDICATE, S.Fixed(self.preds))]
        if ctx.labels is not None:
            filters.append(S.QuadFilter(S.LABEL, S.Fixed(ctx.labels)))
        # the saved value: goal direction tagged; joined back on start=id
        branch = S.NodesFrom(
            start, S.Quads(tuple(filters), save=((goal, self.tag),))
        )
        if self.optional:
            return S.Intersect((shape,), optional=(branch,)), ctx
        return S.Intersect((shape, branch)), ctx

    def reversed(self):
        return self


@dataclass(frozen=True)
class _Tag(_Op):
    tags: tuple[str, ...]

    def apply(self, shape, ctx):
        return S.Tag(shape, self.tags), ctx

    def reversed(self):
        return self


@dataclass(frozen=True)
class _Back(_Op):
    tag: str

    def apply(self, shape, ctx):
        return S.Back(shape, self.tag), ctx


@dataclass(frozen=True)
class _SetOp(_Op):
    kind: str  # and | or | except
    other: "Path"

    def apply(self, shape, ctx):
        o = self.other._fold(S.AllNodes(), ctx)[0]
        if self.kind == "and":
            return S.Intersect((shape, o)), ctx
        if self.kind == "or":
            return S.Union((shape, o)), ctx
        if self.kind == "or_short":
            return S.Union((shape, o), short=True), ctx
        return S.Except(exclude=o, all=shape), ctx


@dataclass(frozen=True)
class _Follow(_Op):
    sub: "Path"
    rev: bool = False

    def apply(self, shape, ctx):
        ops = self.sub._reversed_ops() if self.rev else self.sub.ops
        for op in ops:
            shape, ctx = op.apply(shape, ctx)
        return shape, ctx

    def reversed(self):
        return replace(self, rev=not self.rev)


@dataclass(frozen=True)
class _FollowRecursive(_Op):
    sub: "Path"
    max_depth: int = 50
    depth_tag: str | None = None

    def apply(self, shape, ctx):
        sub = self.sub

        def step(frontier: S.Shape) -> S.Shape:
            s, c = frontier, ctx
            for op in sub.ops:
                s, c = op.apply(s, c)
            return s

        # Single label-free predicate hop? Expose it so the compiler
        # can price the edge slice (adaptive driver-BFS fast path).
        via_hop = None
        if ctx.labels is None and len(sub.ops) == 1:
            op = sub.ops[0]
            if (
                isinstance(op, _Out)
                and not op.pred_tags
                and (op.preds is None or all(isinstance(p, Value) for p in op.preds))
            ):
                frm, to = ("o", "s") if op.rev else ("s", "o")
                pids = None if op.preds is None else tuple(p.id for p in op.preds)
                via_hop = (frm, to, pids)
        return (
            S.Recursive(shape, step, self.max_depth, self.depth_tag, via_hop),
            ctx,
        )


@dataclass(frozen=True)
class _OptionalPath(_Op):
    """Apply a morphism optionally: results keep the current position;
    the branch's tag bindings attach where the morphism succeeds and
    are null elsewhere (reference query/path/path.go Optional /
    morphism.go optionalMorphism). The branch is folded from the
    current shape with a hidden origin tag and repositioned on it, so
    the optional join is on the origin node."""

    sub: "Path"

    def apply(self, shape, ctx):
        tagged = S.Tag(shape, ("__opt_origin",))
        branch, _ = self.sub._fold(tagged, ctx)
        branch = S.Back(branch, "__opt_origin")
        return S.Intersect((shape,), optional=(branch,)), ctx


@dataclass(frozen=True)
class _Labels(_Op):
    """Distinct labels of edges incident (either direction) to the
    current nodes (reference query/shape/path.go:131-143)."""

    def apply(self, shape, ctx):
        qs = S.NodesFrom(S.LABEL, S.Quads((S.QuadFilter(S.SUBJECT, shape),)))
        qo = S.NodesFrom(S.LABEL, S.Quads((S.QuadFilter(S.OBJECT, shape),)))
        return S.Unique(S.Union((qs, qo))), ctx


@dataclass(frozen=True)
class _Predicates(_Op):
    rev: bool = False

    def apply(self, shape, ctx):
        d = S.OBJECT if self.rev else S.SUBJECT
        q = S.Quads((S.QuadFilter(d, shape),))
        return S.Unique(S.NodesFrom(S.PREDICATE, q)), ctx


@dataclass(frozen=True)
class _SavePredicates(_Op):
    tag: str
    rev: bool = False

    def apply(self, shape, ctx):
        d = S.OBJECT if self.rev else S.SUBJECT
        branch = S.NodesFrom(
            d, S.Quads((S.QuadFilter(d, shape),), save=((S.PREDICATE, self.tag),))
        )
        return S.Intersect((shape, branch)), ctx


@dataclass(frozen=True)
class _LabelContext(_Op):
    labels: tuple[Value, ...] | None

    def apply(self, shape, ctx):
        return shape, replace(ctx, labels=self.labels)

    def reversed(self):
        return self


@dataclass(frozen=True)
class _Filter(_Op):
    filters: tuple[S.ValueFilter, ...]

    def apply(self, shape, ctx):
        return S.Filter(shape, self.filters), ctx

    def reversed(self):
        return self


@dataclass(frozen=True)
class _Simple(_Op):
    kind: str
    n: int = 0

    def apply(self, shape, ctx):
        if self.kind == "unique":
            return S.Unique(shape), ctx
        if self.kind == "limit":
            return S.Page(shape, limit=self.n), ctx
        if self.kind == "skip":
            return S.Page(shape, skip=self.n), ctx
        if self.kind == "order":
            return S.Sort(shape), ctx
        if self.kind == "count":
            return S.Count(shape), ctx
        raise AssertionError(self.kind)


class Path:
    """Immutable fluent path. ``Path.start(store, "<bob>")`` ≡
    ``cayley.StartPath(qs, quad.IRI("bob"))``."""

    def __init__(self, store: GraphStore | None, ops: tuple[_Op, ...] = ()):
        self.store = store
        self.ops = ops

    # -------- construction --------

    @classmethod
    def start(cls, store: GraphStore | None, *nodes) -> "Path":
        ops: tuple[_Op, ...] = ()
        if nodes:
            ops = (_Is(_vals(nodes)),)
        return cls(store, ops)

    @classmethod
    def morphism(cls) -> "Path":
        return cls(None)

    def _add(self, op: _Op) -> "Path":
        return Path(self.store, self.ops + (op,))

    # -------- traversals (gizmo surface, traversals.go) --------

    def is_(self, *nodes):
        return self._add(_Is(_vals(nodes)))

    @staticmethod
    def _preds(preds):
        if not preds:
            return None
        if len(preds) == 1 and isinstance(preds[0], Path):
            return preds[0]
        return _vals(preds)

    def out(self, *preds, tags: Sequence[str] = ()):
        return self._add(_Out(self._preds(preds), tuple(tags)))

    def in_(self, *preds, tags: Sequence[str] = ()):
        return self._add(_Out(self._preds(preds), tuple(tags), rev=True))

    def both(self, *preds, tags: Sequence[str] = ()):
        return self._add(_Both(self._preds(preds), tuple(tags)))

    def has(self, pred, *values):
        return self._add(_Has(_vals([pred]), _vals(values)))

    def has_r(self, pred, *values):
        return self._add(_Has(_vals([pred]), _vals(values), rev=True))

    def has_filter(self, pred, *filters: S.ValueFilter):
        return self._add(_Has(_vals([pred]), (), filters=tuple(filters)))

    def has_filter_r(self, pred, *filters: S.ValueFilter):
        return self._add(
            _Has(_vals([pred]), (), filters=tuple(filters), rev=True)
        )

    def save(self, pred, tag):
        return self._add(_Save(_vals([pred]), tag))

    def save_r(self, pred, tag):
        return self._add(_Save(_vals([pred]), tag, rev=True))

    def save_opt(self, pred, tag):
        return self._add(_Save(_vals([pred]), tag, optional=True))

    def save_opt_r(self, pred, tag):
        return self._add(_Save(_vals([pred]), tag, rev=True, optional=True))

    def tag(self, *names):
        return self._add(_Tag(tuple(names)))

    as_ = tag

    def back(self, name):
        return self._add(_Back(name))

    def and_(self, other: "Path"):
        return self._add(_SetOp("and", other))

    intersect = and_

    def or_(self, other: "Path"):
        return self._add(_SetOp("or", other))

    union = or_

    def or_short(self, other: "Path"):
        """Short-circuit union: results come from the first non-empty
        branch only (reference graph/iterator/or.go:49-56)."""
        return self._add(_SetOp("or_short", other))

    def except_(self, other: "Path"):
        return self._add(_SetOp("except", other))

    difference = except_

    def follow(self, sub: "Path"):
        return self._add(_Follow(sub))

    def follow_r(self, sub: "Path"):
        return self._add(_Follow(sub, rev=True))

    def follow_recursive(self, via, max_depth: int = 50, depth_tag: str | None = None):
        sub = via if isinstance(via, Path) else Path(None).out(via)
        return self._add(_FollowRecursive(sub, max_depth, depth_tag))

    def optional(self, sub: "Path"):
        """Follow ``sub`` optionally: keeps every current result; tag
        bindings from ``sub`` attach where it succeeds (reference
        query/path/path.go Optional)."""
        return self._add(_OptionalPath(sub))

    def labels(self):
        return self._add(_Labels())

    def in_predicates(self):
        return self._add(_Predicates(rev=True))

    def out_predicates(self):
        return self._add(_Predicates())

    def save_in_predicates(self, tag):
        return self._add(_SavePredicates(tag, rev=True))

    def save_out_predicates(self, tag):
        return self._add(_SavePredicates(tag))

    def label_context(self, *labels):
        return self._add(_LabelContext(_vals(labels) if labels else None))

    def filter(self, *filters):
        """Value filters: ValueFilter shapes, or plain Python callables
        ``Value -> bool`` (wrapped as the generic ValueFilterFunc,
        reference graph/iterator/value_filter.go:24-75)."""
        fs = tuple(
            f if isinstance(f, S.ValueFilter) else S.ValueFilterFunc(fn=f)
            for f in filters
        )
        return self._add(_Filter(fs))

    def regex(self, pattern, refs: bool = False):
        return self._add(_Filter((S.Regexp(pattern, refs),)))

    def like(self, pattern):
        return self._add(_Filter((S.Wildcard(pattern),)))

    def unique(self):
        return self._add(_Simple("unique"))

    def limit(self, n: int):
        return self._add(_Simple("limit", n))

    def skip(self, n: int):
        return self._add(_Simple("skip", n))

    def order(self):
        return self._add(_Simple("order"))

    # -------- reversal (reference path.go:136-145) --------

    def _reversed_ops(self) -> tuple[_Op, ...]:
        return tuple(op.reversed() for op in reversed(self.ops))

    def reverse(self) -> "Path":
        return Path(self.store, self._reversed_ops())

    # -------- execution --------

    def _fold(self, base: S.Shape, ctx: _Ctx) -> tuple[S.Shape, _Ctx]:
        shape = base
        for op in self.ops:
            shape, ctx = op.apply(shape, ctx)
        return shape, ctx

    def shape(self) -> S.Shape:
        return self._fold(S.AllNodes(), _Ctx())[0]

    def df(self) -> DataFrame:
        """Raw result: DataFrame[id, *tags] of node ids."""
        assert self.store is not None, "morphism path has no store"
        return compile_nodes(self.store, self.shape())

    def count(self) -> int:
        return self.count_df().collect()[0][0]

    def count_df(self) -> DataFrame:
        """Count as a one-row DataFrame[count: long] (path multiplicity
        included — reference graph/iterator/count.go semantics)."""
        return compile_nodes(self.store, S.Count(self.shape()))

    def values_df(self) -> DataFrame:
        """Rendered result: every id/tag column as its N-Quads term.
        Re-applies Order()'s sort after the rendering joins."""
        if getattr(self.store, "_local_index", None) is not None:
            from ..plans.local import try_local_values

            out = try_local_values(self.store, self.shape())
            if out is not None:
                return out
        df = self.df()
        out = self.store.resolve(df)
        if "__ord" in out.columns:
            out = out.orderBy("__ord").drop("__ord")
        return out.select(
            *[
                F.col("`" + c + "`")
                for c in df.columns
                if not c.startswith("__")
            ]
        )

    def all(self) -> list[dict]:
        """Result as a list of {tag: term} dicts ('id' = result node) —
        the shape the golden corpora compare (FIXTURES.md §5). On a
        local-engine store the rows come straight off the driver-side
        evaluation (plans/local.try_local_rows) — no DataFrame bridge,
        no Spark job: point-query latency is the local eval itself."""
        if getattr(self.store, "_local_index", None) is not None:
            from ..plans.local import try_local_rows

            t = try_local_rows(self.store, self.shape())
            if t is not None:
                return [dict(zip(t.cols, r)) for r in t.rows]
        return [r.asDict() for r in self.values_df().collect()]

    def all_values(self) -> list[str]:
        if getattr(self.store, "_local_index", None) is not None:
            from ..plans.local import try_local_rows

            t = try_local_rows(self.store, self.shape())
            if t is not None:
                j = t.cols.index("id")
                return [r[j] for r in t.rows]
        return [r["id"] for r in self.values_df().select("id").collect()]


def start_path(store: GraphStore, *nodes) -> Path:
    return Path.start(store, *nodes)

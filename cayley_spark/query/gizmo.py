"""Gizmo-style query surface (the reference's primary language).

Method-for-method Python mirror of the Gizmo JS API
(/root/reference/query/gizmo/environ.go:45-122 graph object;
/root/reference/query/gizmo/traversals.go path methods;
/root/reference/query/gizmo/finals.go finals). Gizmo programs are
JavaScript; the reference runs them in a goja VM. Running real JS is
out of scope — instead the full method surface exists in Python with
the reference's exact names (both Gizmo PascalCase and JS camelCase
aliases), so the 77-case gizmo corpus ports mechanically:

    g = graph(store)
    g.V("<bob>").In("<follows>").All()
    g.V().Has("<name>", "Speed").Save("<name>", "movie").All()

Finals return JSON-collated results (gizmo.go:124-136): IRIs/BNodes as
bracketed terms, strings bare, numbers/bools native — matching the
reference's integration-test expectations byte for byte.
"""

from __future__ import annotations

from typing import Callable

from .path import Path
from ..store import GraphStore
from ..values import IRI, Value, coerce


def _json_native(term: str):
    """N-Quads term → gizmo JSON collation value."""
    from ..values import parse_term

    if term is None:
        return None
    v = parse_term(term)
    from ..values import BNode, IRI as _IRI

    if isinstance(v, (_IRI, BNode)):
        return term  # bracketed IRI / _:bnode, as the reference emits
    return v.native()


class GizmoPath:
    """Fluent path with Gizmo naming; wraps the core Path."""

    def __init__(self, g: "graph", p: Path):
        self._g = g
        self._p = p

    def _wrap(self, p: Path) -> "GizmoPath":
        return GizmoPath(self._g, p)

    def _other(self, o):
        return o._p if isinstance(o, GizmoPath) else o

    # -------- traversals (traversals.go) --------

    def Is(self, *nodes):
        return self._wrap(self._p.is_(*nodes))

    def _via_args(self, via) -> tuple:
        """JS via spec (traversals.go toViaData): null = any predicate,
        array = several, string/value/path = one."""
        if via is None:
            return ()
        if isinstance(via, (list, tuple)):
            return tuple(self._via(p) for p in via)
        return (self._via(via),)

    @staticmethod
    def _tag_args(tags) -> tuple:
        if tags is None:
            return ()
        if isinstance(tags, (list, tuple)):
            return tuple(tags)
        return (tags,)

    def In(self, via=None, tags=None):
        return self._wrap(
            self._p.in_(*self._via_args(via), tags=self._tag_args(tags))
        )

    def Out(self, via=None, tags=None):
        return self._wrap(
            self._p.out(*self._via_args(via), tags=self._tag_args(tags))
        )

    def Both(self, via=None, tags=None):
        return self._wrap(
            self._p.both(*self._via_args(via), tags=self._tag_args(tags))
        )

    def Follow(self, m):
        return self._wrap(self._p.follow(self._other(m)))

    def FollowR(self, m):
        return self._wrap(self._p.follow_r(self._other(m)))

    def FollowRecursive(self, via, *opts, max_depth: int = 50, depth_tag=None):
        # JS signature (traversals.go FollowRecursive): extra args may
        # be an int (maxDepth) and/or a string (depth tag), in any order
        for o in opts:
            if isinstance(o, bool):
                raise TypeError("followRecursive: bad argument")
            if isinstance(o, int):
                max_depth = o
            elif isinstance(o, str):
                depth_tag = o
            elif isinstance(o, (list, tuple)) and all(
                isinstance(t, str) for t in o
            ) and o:
                depth_tag = o[0]
            else:
                raise TypeError("followRecursive: bad argument")
        return self._wrap(
            self._p.follow_recursive(
                self._other(via) if isinstance(via, GizmoPath) else self._via(via),
                max_depth,
                depth_tag,
            )
        )

    def And(self, other):
        return self._wrap(self._p.and_(self._other(other)))

    Intersect = And

    def Or(self, other):
        return self._wrap(self._p.or_(self._other(other)))

    Union = Or

    def Except(self, other):
        return self._wrap(self._p.except_(self._other(other)))

    Difference = Except

    def Back(self, tag):
        return self._wrap(self._p.back(tag))

    def Tag(self, *tags):
        return self._wrap(self._p.tag(*tags))

    As = Tag

    def _has(self, pred, values, rev: bool):
        from .. import shapes as S

        filters = tuple(v for v in values if isinstance(v, S.ValueFilter))
        if filters:
            # has(pred, gt(...)) — filter form (traversals.go has →
            # HasFilter); values and filters don't mix in the corpus
            if rev:
                return self._wrap(
                    self._p.has_filter_r(self._via(pred), *filters)
                )
            return self._wrap(self._p.has_filter(self._via(pred), *filters))
        if rev:
            return self._wrap(self._p.has_r(self._via(pred), *values))
        return self._wrap(self._p.has(self._via(pred), *values))

    def Has(self, pred, *values):
        return self._has(pred, values, rev=False)

    def HasR(self, pred, *values):
        return self._has(pred, values, rev=True)

    def _save_tag(self, pred, tag):
        """Default tag = the predicate's term string
        (traversals.go:476-488 save)."""
        if tag is not None:
            return tag
        from ..values import coerce

        return coerce(self._via(pred)).term()

    def Save(self, pred, tag=None):
        return self._wrap(self._p.save(self._via(pred), self._save_tag(pred, tag)))

    def SaveR(self, pred, tag=None):
        return self._wrap(self._p.save_r(self._via(pred), self._save_tag(pred, tag)))

    def SaveOpt(self, pred, tag=None):
        return self._wrap(self._p.save_opt(self._via(pred), self._save_tag(pred, tag)))

    def SaveOptR(self, pred, tag=None):
        return self._wrap(
            self._p.save_opt_r(self._via(pred), self._save_tag(pred, tag))
        )

    def Unique(self):
        return self._wrap(self._p.unique())

    def Labels(self):
        return self._wrap(self._p.labels())

    def InPredicates(self):
        return self._wrap(self._p.in_predicates())

    def OutPredicates(self):
        return self._wrap(self._p.out_predicates())

    def SaveInPredicates(self, tag):
        return self._wrap(self._p.save_in_predicates(tag))

    def SaveOutPredicates(self, tag):
        return self._wrap(self._p.save_out_predicates(tag))

    def LabelContext(self, *labels):
        # labelContext(null) closes the open context (traversals.go)
        if len(labels) == 1 and labels[0] is None:
            labels = ()
        return self._wrap(self._p.label_context(*labels))

    def Filter(self, *filters):
        return self._wrap(self._p.filter(*filters))

    def Regex(self, pattern, refs: bool = False):
        return self._wrap(self._p.regex(pattern, refs))

    def Like(self, pattern):
        return self._wrap(self._p.like(pattern))

    def Limit(self, n):
        return self._wrap(self._p.limit(n))

    def Skip(self, n):
        return self._wrap(self._p.skip(n))

    def Order(self):
        return self._wrap(self._p.order())

    def _via(self, pred):
        """Gizmo via argument: string/value or a path (resolved to its
        node set at compile time)."""
        if isinstance(pred, GizmoPath):
            return pred._p
        return pred

    # -------- finals (finals.go) --------

    def All(self) -> list[dict]:
        rows = self._p.all()
        if self._g.raw:
            return rows
        return [{k: _json_native(v) for k, v in row.items()} for row in rows]

    def GetLimit(self, n: int) -> list[dict]:
        return self._wrap(self._p.limit(n)).All()

    def _native_rows(self, limit: int = -1) -> list[dict]:
        """Values handed back INTO the program (toValue/toArray/...)
        always use the native collation (reference gizmo.go:124-136
        quadValueToNative runs inside the VM regardless of the
        session's result collation)."""
        p = self._p.limit(limit) if limit and limit > 0 else self._p
        return [
            {k: _json_native(v) for k, v in row.items()} for row in p.all()
        ]

    def ToArray(self, limit: int = -1) -> list:
        return [r["id"] for r in self._native_rows(limit)]

    def TagArray(self) -> list[dict]:
        return self.All()

    def ToValue(self):
        arr = self._native_rows(1)
        return arr[0]["id"] if arr else None

    def TagValue(self):
        arr = self._native_rows(1)
        return arr[0] if arr else None

    def Count(self) -> int:
        return self._p.count()

    def ForEach(self, callback: Callable[[dict], None], limit: int = -1):
        """gizmo forEach: stream results through a driver callback
        (finals.go:138-163). Accepts the JS argument order too —
        ``forEach(limit, callback)`` (finals.go:128-136). Uses
        toLocalIterator so only one partition is resident driver-side
        at a time."""
        if isinstance(callback, int) and callable(limit):
            callback, limit = limit, callback
        df = (self._p.limit(limit) if limit > 0 else self._p).values_df()
        for row in df.toLocalIterator():
            callback({k: _json_native(v) for k, v in row.asDict().items()})

    Map = ForEach

    # js-style camelCase aliases (gizmo accepts both: docs use .all())
    is_ = Is
    in_ = In
    out = Out
    both = Both
    follow = Follow
    followR = FollowR
    followRecursive = FollowRecursive
    and_ = And
    intersect = And
    or_ = Or
    union = Or
    except_ = Except
    difference = Except
    back = Back
    tag = Tag
    has = Has
    hasR = HasR
    save = Save
    saveR = SaveR
    saveOpt = SaveOpt
    saveOptR = SaveOptR
    unique = Unique
    labels = Labels
    inPredicates = InPredicates
    outPredicates = OutPredicates
    saveInPredicates = SaveInPredicates
    saveOutPredicates = SaveOutPredicates
    labelContext = LabelContext
    filter = Filter
    regex = Regex
    like = Like
    limit = Limit
    skip = Skip
    order = Order
    all = All
    getLimit = GetLimit
    toArray = ToArray
    tagArray = TagArray
    toValue = ToValue
    tagValue = TagValue
    count = Count
    forEach = ForEach
    map = ForEach


class graph:
    """The gizmo ``g`` object (environ.go:45-122)."""

    def __init__(self, store: GraphStore, raw: bool = False):
        # raw=True: finals return N-Quads term strings instead of JSON
        # natives (the Raw/REPL collations, query/session.go:52-60)
        self.store = store
        self.raw = raw
        self._ns: dict[str, str] = {}
        self._emitted: list = []

    def V(self, *nodes) -> GizmoPath:
        return GizmoPath(self, Path.start(self.store, *nodes))

    Vertex = V

    def M(self) -> GizmoPath:
        return GizmoPath(self, Path.morphism())

    Morphism = M

    def IRI(self, s: str) -> Value:
        """Expand a prefixed name against registered namespaces."""
        if ":" in s:
            pref, _, rest = s.partition(":")
            if pref in self._ns:
                return IRI(self._ns[pref] + rest)
        return IRI(s)

    def AddNamespace(self, pref: str, uri: str):
        self._ns[pref] = uri

    addNamespace = AddNamespace

    def AddDefaultNamespaces(self):
        self.AddNamespace("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#")
        self.AddNamespace("rdfs", "http://www.w3.org/2000/01/rdf-schema#")
        self.AddNamespace("schema", "http://schema.org/")

    addDefaultNamespaces = AddDefaultNamespaces

    def LoadNamespaces(self):
        """Load namespaces saved in the graph (reference
        query/gizmo/environ.go:59-62 → schema/namespaces.go:41-57):
        entities typed ``cayley:namespace`` whose ``@id`` is the full
        IRI and whose ``cayley:prefix`` holds the prefix."""
        rdf_type = IRI("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        rows = (
            Path.start(self.store)
            .has(rdf_type, IRI("cayley:namespace"))
            .save(IRI("cayley:prefix"), "prefix")
            .all()
        )
        from ..values import parse_term, IRI as _IRI

        for r in rows:
            full, pref = parse_term(r["id"]), parse_term(r["prefix"])
            if isinstance(full, _IRI) and isinstance(pref, _IRI):
                self.AddNamespace(pref.s.rstrip(":"), full.s)

    loadNamespaces = LoadNamespaces

    def Emit(self, value):
        """g.emit — append an arbitrary value to the session output
        (environ.go:112-122)."""
        self._emitted.append(value)

    emit = Emit

    def emitted(self) -> list:
        out, self._emitted = self._emitted, []
        return out


def gizmo_graph(store: GraphStore) -> graph:
    return graph(store)

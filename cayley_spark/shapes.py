"""Shape algebra — the optimizer-facing logical IR.

A Python re-expression of the reference's ``query/shape`` package
(/root/reference/query/shape/shape.go). Shapes are frozen dataclasses;
the compiler (plans/compiler.py) lowers them to DataFrames exactly the
way the reference's own SQL backend lowers them to SELECT/JOIN
(graph/sql/optimizer.go:80-565 — the existence proof that this algebra
is relational).

Node shapes evaluate to DataFrame[id: long, *tags: long];
quad shapes evaluate to DataFrame[s, p, o, l, *tags].
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from .values import Value

# directions
SUBJECT, PREDICATE, OBJECT, LABEL = "s", "p", "o", "l"


class Shape:
    """Node-set shape."""

    __slots__ = ()


class QuadShape:
    """Quad-set shape."""

    __slots__ = ()


# ---------------- leaf shapes ----------------


@dataclass(frozen=True)
class AllNodes(Shape):
    """All distinct nodes (reference query/shape/shape.go:244-254)."""


@dataclass(frozen=True)
class Fixed(Shape):
    """Literal set of values (Fixed/Lookup; reference shape.go:746-870 —
    Lookup resolves to Fixed at optimize time; here hashing makes the
    resolution a pure constant fold, no store round-trip needed)."""

    values: tuple[Value, ...]


# ---------------- quad shapes ----------------


@dataclass(frozen=True)
class QuadFilter:
    """Constrain one direction of a quad set to a node set
    (reference shape.go:440-459; the LinksTo analog)."""

    dir: str  # s|p|o|l
    values: Shape


@dataclass(frozen=True)
class Quads(QuadShape):
    """Quad scan with per-direction constraints and direction tags
    (covers Quads + QuadsAction fusion, reference shape.go:463-480,
    624-732 — Catalyst re-fuses filter+project anyway)."""

    filters: tuple[QuadFilter, ...] = ()
    save: tuple[tuple[str, str], ...] = ()  # (dir, tag)


# ---------------- projections ----------------


@dataclass(frozen=True)
class NodesFrom(Shape):
    """Project direction ``dir`` out of a quad set (HasA; reference
    graph/hasa.go:50-57, shape.go:520-620). Keeps duplicate rows — one
    per quad — preserving per-path multiplicity (NextPath semantics)."""

    dir: str
    quads: QuadShape


@dataclass(frozen=True)
class Tag(Shape):
    """Bind the current node id under tag name(s)
    (Save; reference graph/iterator/save.go:30-118)."""

    sub: Shape
    tags: tuple[str, ...]


@dataclass(frozen=True)
class Back(Shape):
    """Re-position the path at a previously tagged binding; all other
    bindings are retained (reference query/path/path.go:339 Back)."""

    sub: Shape
    tag: str


# ---------------- composition ----------------


@dataclass(frozen=True)
class Intersect(Shape):
    """n-way intersection on node id, merging tag bindings
    (And; reference graph/iterator/and.go:24-110, shape.go:919-1246).
    ``optional`` branches contribute tags but never filter (left-outer;
    reference and.go:103-108)."""

    sub: tuple[Shape, ...]
    optional: tuple[Shape, ...] = ()


@dataclass(frozen=True)
class Union(Shape):
    """Bag union; duplicates preserved, missing tags null-filled
    (Or; reference graph/iterator/or.go:17-49). With ``short=True``,
    only the FIRST non-empty branch contributes results (short-circuit
    Or, reference or.go:49-56 NewShortCircuitOr) — branches are
    evaluated in order and evaluation stops at the first with rows."""

    sub: tuple[Shape, ...]
    short: bool = False


@dataclass(frozen=True)
class Except(Shape):
    """Complement: ``all`` minus ``exclude``
    (Not; reference graph/iterator/not.go:9-30, shape.go:256-292)."""

    exclude: Shape
    all: Shape = field(default_factory=AllNodes)


@dataclass(frozen=True)
class Unique(Shape):
    """First-seen dedup on node id; kills path multiplicity
    (reference graph/iterator/unique.go:9-58; tie-break among paths is
    nondeterministic, same as the reference's iteration order)."""

    sub: Shape


# ---------------- filters ----------------


class ValueFilter:
    __slots__ = ()


@dataclass(frozen=True)
class Comparison(ValueFilter):
    """Typed comparison with kind-gating: compares only same-typed
    values, everything else is dropped — NOT SQL coercion
    (reference graph/iterator/value_comparison.go:62-159)."""

    op: str  # lt | lte | gt | gte
    value: Value


@dataclass(frozen=True)
class Regexp(ValueFilter):
    """RE2 regex over string values; ``refs=True`` also matches
    IRI/BNode text (reference graph/iterator/regex.go:47-70)."""

    pattern: str
    refs: bool = False


@dataclass(frozen=True)
class Wildcard(ValueFilter):
    """``%``/``?`` glob compiled to anchored regex
    (reference query/shape/shape.go:362-407)."""

    pattern: str


@dataclass(frozen=True)
class ValueFilterFunc(ValueFilter):
    """Arbitrary value predicate (reference graph/iterator/
    value_filter.go:24-75 — accepts any ``func(quad.Value) bool``).
    Two forms, tried in order:

    - ``expr``: a callable receiving a dict of dictionary Columns
      ``{kind, str, i64, f64, bool, ts, term}`` and returning a
      boolean Column — stays JVM-side inside whole-stage codegen.
      Prefer this whenever the predicate is relationally expressible.
    - ``fn``: a Python callable ``Value -> bool``, applied as an
      Arrow-batched pandas UDF over the rendered N-Quads term — the
      fully-general (and slower) path, mirroring the reference's
      opaque-callback contract.
    """

    expr: Callable | None = None
    fn: Callable | None = None


@dataclass(frozen=True)
class Filter(Shape):
    """Apply value filters to a node set (reference shape.go:299-331)."""

    sub: Shape
    filters: tuple[ValueFilter, ...]


# ---------------- paging / ordering / aggregation ----------------


@dataclass(frozen=True)
class Page(Shape):
    """Skip/limit composition (reference shape.go:1313-1370)."""

    sub: Shape
    skip: int = 0
    limit: int = 0  # <=0: unlimited


@dataclass(frozen=True)
class Sort(Shape):
    """Order by the N-Quads string form of the value
    (reference graph/iterator/sort.go:69-75)."""

    sub: Shape


@dataclass(frozen=True)
class Count(Shape):
    """Single-row result: number of paths (duplicates counted;
    reference graph/iterator/count.go:10-60)."""

    sub: Shape


# ---------------- recursion ----------------


@dataclass(frozen=True)
class Recursive(Shape):
    """Transitive closure of a morphism: BFS with a global visited set,
    per-node depth of first visit, default max depth 50
    (reference graph/iterator/recursive.go:19-298). Compiled as a
    driver-side iterative DataFrame loop with per-round
    localCheckpoint to cut lineage (SURVEY.md §4 custom-rule note)."""

    sub: Shape
    step: Callable  # Shape -> Shape, applied to a Fixed-like frontier
    max_depth: int = 50
    depth_tag: str | None = None
    #: when the step is a single label-free predicate hop, the
    #: (from_dir, to_dir, pred_ids|None) triple — lets the compiler
    #: price the edge slice and pick a driver-side BFS for small
    #: slices (the morphism stays opaque otherwise)
    via_hop: tuple | None = None


@dataclass(frozen=True)
class Materialize(Shape):
    """Persist hint for expensive branches probed many times
    (reference graph/iterator/materialize.go; here a .persist())."""

    sub: Shape

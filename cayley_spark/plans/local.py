"""Driver-side local execution engine for small stores.

The in-memory counterpart of the distributed shape compiler — the
Spark-repo analog of the reference's memstore execution
(/root/reference/graph/memstore/quadstore.go: quads + per-direction
hash indexes iterated entirely in RAM). The reference's published
baseline numbers (BASELINE.md) are memstore numbers: ~20 ms point
queries on a loaded in-memory graph. A distributed plan cannot reach
that floor — every Spark job pays scheduler + stage launch overhead
(~50-100 ms × number of shuffle stages) regardless of data size — so
small warm stores get the same *adaptive* treatment the recursion
operator already has (plans/compiler.py:_recursive_driver_bfs): when
the store fits a measured budget, collect it ONCE into driver-side
indexes and evaluate the whole shape tree in Python; everything else
keeps the distributed plan. The two engines share one logical IR
(shapes.py), and every construct here mirrors the compiler's lowering
rule for the same shape, clause for clause — tests run the full
pathtest + movie corpora through BOTH engines and diff the results.

Scale posture: the local path is a *latency* optimization that prices
itself out on big data — ``GraphStore.enable_local`` declines beyond
the quad budget (default 1M), so a 100 TB store always executes
distributed. Nothing here is on the scale path.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from .. import shapes as S
from ..values import IRI, BNode, Bool, Float, Int, String, Time

#: bail out to the distributed engine if any intermediate local table
#: exceeds this many rows (guards pathological join multiplications)
_MAX_LOCAL_ROWS = 5_000_000

_DIRS = ("s", "p", "o", "l")


class Unsupported(Exception):
    """Shape (or sub-construct) the local engine does not evaluate —
    the caller falls back to the distributed compiler."""


@dataclass
class LTable:
    """A tiny driver-side relation: named columns over tuple rows.
    Column semantics match the compiler's DataFrames exactly —
    ``id``/tag columns hold node ids (long), depth tags int,
    ``__ord`` the canonical term string."""

    cols: list[str]
    rows: list[tuple]
    types: dict[str, str] = field(default_factory=dict)

    def col_idx(self, name: str) -> int:
        return self.cols.index(name)

    def tags(self) -> list[str]:
        return [c for c in self.cols if c != "id" and not c.startswith("__")]

    def typ(self, c: str) -> str:
        return self.types.get(c, "long")


@dataclass(frozen=True, eq=False)
class _LocalFrontier(S.Shape):
    """Internal: a pre-evaluated frontier (recursion loop), the local
    twin of the compiler's _DFShape. Hash/eq by identity."""

    table: LTable


class LocalIndex:
    """Collected quads + node dictionary with lazily-built per-direction
    hash indexes (the memstore's QuadDirectionIndex analog)."""

    def __init__(self, quads: list[tuple], nodes: dict[int, dict]):
        self.quads = quads  # list[(s, p, o, l)]
        self.nodes = nodes  # id -> {kind,term,str,i64,f64,bool,ts}
        self._by_dir: dict[str, dict] = {}
        self._by_pd: dict[tuple, dict] = {}

    @classmethod
    def from_store(cls, store) -> "LocalIndex":
        # toArrow preserves int64 + nulls exactly (toPandas would widen
        # nullable longs to float64 and corrupt 64-bit hash ids)
        qt = store.quads.select("s", "p", "o", "l").toArrow()
        quads = list(
            zip(
                qt.column("s").to_pylist(),
                qt.column("p").to_pylist(),
                qt.column("o").to_pylist(),
                qt.column("l").to_pylist(),
            )
        )
        nt = store.nodes.select(
            "id", "kind", "term", "str", "i64", "f64", "bool", "ts"
        ).toArrow()
        cols = {c: nt.column(c).to_pylist() for c in nt.column_names}
        nodes = {
            cols["id"][i]: {
                "kind": cols["kind"][i],
                "term": cols["term"][i],
                "str": cols["str"][i],
                "i64": cols["i64"][i],
                "f64": cols["f64"][i],
                "bool": cols["bool"][i],
                "ts": cols["ts"][i],
            }
            for i in range(len(cols["id"]))
        }
        out = cls(quads, nodes)
        # Prebuild the per-direction indexes AND the (predicate, s|o)
        # adjacency maps — part of enable_local's one-time load cost,
        # so no query (not even the first per predicate) pays them.
        # These are the memstore's QuadDirectionIndex equivalents.
        for d in _DIRS:
            out.by_dir(d)
        for d in ("s", "o"):
            di = _DIRS.index(d)
            for pid, idxs in out._by_dir["p"].items():
                m: dict = {}
                for i in idxs:
                    v = quads[i][di]
                    if v is not None:
                        m.setdefault(v, []).append(i)
                out._by_pd[(pid, d)] = m
        return out

    def by_dir(self, d: str) -> dict:
        """dir value -> list of quad row indices (nulls excluded)."""
        m = self._by_dir.get(d)
        if m is None:
            di = _DIRS.index(d)
            m = {}
            for i, q in enumerate(self.quads):
                v = q[di]
                if v is not None:
                    m.setdefault(v, []).append(i)
            self._by_dir[d] = m
        return m

    def by_pd(self, pid: int, d: str) -> dict:
        """Within predicate ``pid``: dir value -> quad row indices."""
        key = (pid, d)
        m = self._by_pd.get(key)
        if m is None:
            di = _DIRS.index(d)
            m = {}
            for i in self.by_dir("p").get(pid, ()):
                v = self.quads[i][di]
                if v is not None:
                    m.setdefault(v, []).append(i)
            self._by_pd[key] = m
        return m


# ---------------- shape evaluation ----------------


def _check(rows: list) -> list:
    if len(rows) > _MAX_LOCAL_ROWS:
        raise Unsupported("local intermediate too large")
    return rows


def eval_nodes(idx: LocalIndex, shape: S.Shape) -> LTable:
    """Mirror of compiler._compile_nodes_impl, rule for rule."""
    if isinstance(shape, _LocalFrontier):
        return shape.table
    if isinstance(shape, S.AllNodes):
        return LTable(["id"], [(i,) for i in idx.nodes])
    if isinstance(shape, S.Fixed):
        return LTable(["id"], [(v.id,) for v in shape.values])
    if isinstance(shape, S.NodesFrom):
        q = eval_quads(idx, shape.quads)
        di = q.col_idx(shape.dir)
        keep = [(c, q.col_idx(c)) for c in q.cols if c not in _DIRS]
        cols = ["id"] + [c for c, _ in keep]
        rows = [(r[di], *[r[j] for _, j in keep]) for r in q.rows]
        if shape.dir == S.LABEL:
            rows = [r for r in rows if r[0] is not None]
        return LTable(cols, rows, {c: q.typ(c) for c, _ in keep})
    if isinstance(shape, S.Tag):
        t = eval_nodes(idx, shape.sub)
        out = t
        ii = out.col_idx("id")
        for name in shape.tags:
            out = _with_column(out, name, [r[ii] for r in out.rows], "long")
        return out
    if isinstance(shape, S.Back):
        t = eval_nodes(idx, shape.sub)
        ti = t.col_idx(shape.tag)
        return _with_column(t, "id", [r[ti] for r in t.rows], "long")
    if isinstance(shape, S.Intersect):
        return _eval_intersect(idx, shape)
    if isinstance(shape, S.Union):
        if shape.short:
            first = None
            for s in shape.sub:
                t = eval_nodes(idx, s)
                if first is None:
                    first = t
                if t.rows:
                    return t
            return LTable(first.cols, [], dict(first.types))
        out = eval_nodes(idx, shape.sub[0])
        for s in shape.sub[1:]:
            out = _union_by_name(out, eval_nodes(idx, s))
        return out
    if isinstance(shape, S.Except):
        t = eval_nodes(idx, shape.all)
        excl = {r[0] for r in eval_nodes(idx, shape.exclude).rows}
        ii = t.col_idx("id")
        return LTable(
            t.cols, [r for r in t.rows if r[ii] not in excl], dict(t.types)
        )
    if isinstance(shape, S.Unique):
        t = eval_nodes(idx, shape.sub)
        ii = t.col_idx("id")
        seen: set = set()
        rows = []
        for r in t.rows:
            if r[ii] not in seen:
                seen.add(r[ii])
                rows.append(r)
        return LTable(t.cols, rows, dict(t.types))
    if isinstance(shape, S.Filter):
        return _eval_filter(idx, shape)
    if isinstance(shape, S.Page):
        t = eval_nodes(idx, shape.sub)
        rows = t.rows
        if shape.skip > 0:
            rows = rows[shape.skip:]
        if shape.limit > 0:
            rows = rows[: shape.limit]
        return LTable(t.cols, list(rows), dict(t.types))
    if isinstance(shape, S.Sort):
        t = eval_nodes(idx, shape.sub)
        if "__ord" in t.cols:
            t = _drop_columns(t, ["__ord"])
        ii = t.col_idx("id")
        terms = [
            (idx.nodes.get(r[ii]) or {}).get("term") for r in t.rows
        ]
        out = _with_column(t, "__ord", terms, "string")
        oi = out.col_idx("__ord")
        # Spark ascending sort: nulls first, then binary UTF-8 order
        # (== code-point order, == Python str order)
        out.rows.sort(key=lambda r: (r[oi] is not None, r[oi] or ""))
        return out
    if isinstance(shape, S.Count):
        t = eval_nodes(idx, shape.sub)
        return LTable(["count"], [(len(t.rows),)])
    if isinstance(shape, S.Recursive):
        return _eval_recursive(idx, shape)
    if isinstance(shape, S.Materialize):
        return eval_nodes(idx, shape.sub)
    raise Unsupported(f"local engine cannot evaluate {type(shape).__name__}")


def _with_column(t: LTable, name: str, vals: list, typ: str) -> LTable:
    """withColumn semantics: replace in place if the column exists,
    else append."""
    types = dict(t.types)
    types[name] = typ
    if name in t.cols:
        j = t.col_idx(name)
        rows = [r[:j] + (v,) + r[j + 1:] for r, v in zip(t.rows, vals)]
        return LTable(list(t.cols), rows, types)
    return LTable(
        t.cols + [name], [r + (v,) for r, v in zip(t.rows, vals)], types
    )


def _drop_columns(t: LTable, names: list[str]) -> LTable:
    keep = [j for j, c in enumerate(t.cols) if c not in names]
    types = {c: v for c, v in t.types.items() if c not in names}
    return LTable(
        [t.cols[j] for j in keep],
        [tuple(r[j] for j in keep) for r in t.rows],
        types,
    )


def _union_by_name(a: LTable, b: LTable) -> LTable:
    """unionByName(allowMissingColumns=True): output columns = a's then
    b's extras (in b order); missing values null."""
    cols = list(a.cols) + [c for c in b.cols if c not in a.cols]
    types = dict(a.types)
    for c in b.cols:
        if c not in a.cols:
            types[c] = b.typ(c)
    bpos = {c: j for j, c in enumerate(b.cols)}
    rows = list(a.rows) if cols == a.cols else [
        r + (None,) * (len(cols) - len(a.cols)) for r in a.rows
    ]
    for r in b.rows:
        rows.append(tuple(r[bpos[c]] if c in bpos else None for c in cols))
    return LTable(cols, _check(rows), types)


def _join_on_id(
    out: LTable, bt: LTable, how: str
) -> LTable:
    """Inner/left-outer join on id, appending bt's non-id columns
    (caller has already dropped overlaps) — compiler's tag-merge join."""
    bi = bt.col_idx("id")
    bkeep = [j for j, c in enumerate(bt.cols) if c != "id"]
    groups: dict = {}
    for r in bt.rows:
        groups.setdefault(r[bi], []).append(tuple(r[j] for j in bkeep))
    oi = out.col_idx("id")
    rows = []
    nulls = (None,) * len(bkeep)
    for r in out.rows:
        m = groups.get(r[oi])
        if m:
            for ext in m:
                rows.append(r + ext)
        elif how == "left_outer":
            rows.append(r + nulls)
    cols = out.cols + [bt.cols[j] for j in bkeep]
    types = dict(out.types)
    for j in bkeep:
        types[bt.cols[j]] = bt.typ(bt.cols[j])
    return LTable(cols, _check(rows), types)


def _eval_intersect(idx: LocalIndex, shape: S.Intersect) -> LTable:
    # mirror compiler._compile_intersect: Fixed → literal filters on the
    # driving branch; AllNodes dropped when other branches exist;
    # untagged branch → semi; tagged → inner tag-merge join
    subs = list(shape.sub)
    fixed = [s for s in subs if isinstance(s, S.Fixed)]
    rest = [s for s in subs if not isinstance(s, (S.Fixed, S.AllNodes))]
    if not rest:
        rest = [S.AllNodes()]
    out = eval_nodes(idx, rest[0])
    ii = out.col_idx("id")
    for fx in fixed:
        ids = {v.id for v in fx.values}
        out = LTable(
            out.cols, [r for r in out.rows if r[ii] in ids], dict(out.types)
        )
    for b in rest[1:]:
        ids = {r[ii] for r in out.rows}
        bt = _eval_restricted(idx, b, ids)
        btags = bt.tags()
        if not btags:
            bids = {r[bt.col_idx("id")] for r in bt.rows}
            out = LTable(
                out.cols,
                [r for r in out.rows if r[ii] in bids],
                dict(out.types),
            )
        else:
            bt = _drop_columns(
                bt, [c for c in bt.cols if c != "id" and c not in btags]
            )
            bt = _drop_columns(bt, [c for c in btags if c in out.cols])
            out = _join_on_id(out, bt, "inner")
    for opt in shape.optional:
        ids = {r[ii] for r in out.rows}
        ot = _eval_restricted(idx, opt, ids)
        ot = _drop_columns(
            ot, [c for c in ot.cols if c != "id" and c not in ot.tags()]
        )
        ot = _drop_columns(
            ot, [c for c in ot.cols if c != "id" and c in out.cols]
        )
        out = _join_on_id(out, ot, "left_outer")
    return out


def _eval_restricted(idx: LocalIndex, shape: S.Shape, ids: set) -> LTable:
    """Evaluate a non-driving Intersect branch with the driving side's
    id-set pushed into its quad scan — the local twin of the
    reference and-iterator's Contains probes (graph/iterator/and.go):
    branch rows whose id is outside the driving set can never survive
    the join, so a Save/Has branch over a huge predicate slice (e.g.
    every <name> edge) probes the (p, dir) index per driving id
    instead of materializing the whole slice. Sound for inner,
    semi and left-outer joins alike; multiplicities are untouched
    because the pushed set is distinct."""
    if isinstance(shape, S.Tag):
        t = _eval_restricted(idx, shape.sub, ids)
        ii = t.col_idx("id")
        for name in shape.tags:
            t = _with_column(t, name, [r[ii] for r in t.rows], "long")
        return t
    if isinstance(shape, S.Unique):
        t = _eval_restricted(idx, shape.sub, ids)
        ii = t.col_idx("id")
        seen: set = set()
        rows = []
        for r in t.rows:
            if r[ii] not in seen:
                seen.add(r[ii])
                rows.append(r)
        return LTable(t.cols, rows, dict(t.types))
    if isinstance(shape, S.NodesFrom) and isinstance(shape.quads, S.Quads):
        ft = LTable(["id"], [(i,) for i in ids])
        q2 = S.Quads(
            (S.QuadFilter(shape.dir, _LocalFrontier(ft)),)
            + tuple(shape.quads.filters),
            shape.quads.save,
        )
        return eval_nodes(idx, S.NodesFrom(shape.dir, q2))
    t = eval_nodes(idx, shape)
    ii = t.col_idx("id")
    return LTable(
        t.cols, [r for r in t.rows if r[ii] in ids], dict(t.types)
    )


# ---------------- quad evaluation ----------------


def eval_quads(idx: LocalIndex, qshape: S.QuadShape) -> LTable:
    from .compiler import _as_fixed, _is_distinct, _pure_tag_chain

    if not isinstance(qshape, S.Quads):
        raise Unsupported(f"quad shape {type(qshape).__name__}")
    literals: list[tuple[str, set]] = []
    projections: list[tuple[str, list[str]]] = []
    joins: list[tuple[str, S.Shape]] = []
    for qf in qshape.filters:
        vs = qf.values
        if isinstance(vs, S.AllNodes):
            continue
        fx = _as_fixed(vs)
        if fx is not None:
            literals.append((qf.dir, {v.id for v in fx.values}))
            continue
        tags = _pure_tag_chain(vs)
        if tags is not None and qf.dir != S.LABEL:
            projections.append((qf.dir, tags))
            continue
        joins.append((qf.dir, vs))
    # Filter ordering is multiset-irrelevant (each non-semi step
    # multiplies independently per direction value), so reorder freely
    # for index use: literal predicates restrict via the direction
    # indexes; the common hop pattern (frontier join + single-predicate
    # literal) walks the (p, dir) index from the frontier side when the
    # frontier is much smaller than the predicate slice — the memstore
    # iterator's index-driven LinksTo.
    base_cols = list(_DIRS)
    tbl: LTable | None = None
    p_lits = [ids for d, ids in literals if d == "p"]
    single_pid = (
        next(iter(p_lits[0])) if len(p_lits) == 1 and len(p_lits[0]) == 1
        else None
    )
    if single_pid is not None and joins:
        d, vs = joins[0]
        sub = eval_nodes(idx, vs)
        pslice = len(idx.by_dir("p").get(single_pid, ()))
        if len(sub.rows) * 4 < pslice:
            # build the joined table from the frontier side
            joins = joins[1:]
            si = sub.col_idx("id")
            stags = sub.tags()
            sub2 = _drop_columns(
                sub, [c for c in sub.cols if c != "id" and c not in stags]
            )
            si = sub2.col_idx("id")
            skeep = [j for j, c in enumerate(sub2.cols) if c != "id"]
            pd_idx = idx.by_pd(single_pid, d)
            other_lits = [
                (_DIRS.index(dd), ids) for dd, ids in literals if dd != "p"
            ]
            src_rows = sub2.rows
            if not stags and _is_distinct(vs):
                # semi join: unique ids guaranteed, no multiplication
                src_rows = list({r[si]: r for r in sub2.rows}.values())
            rows = []
            for r in src_rows:
                for i in pd_idx.get(r[si], ()):
                    q = idx.quads[i]
                    if all(q[ddi] in ids for ddi, ids in other_lits):
                        rows.append(q + tuple(r[j] for j in skeep))
            cols = base_cols + [sub2.cols[j] for j in skeep]
            types = {sub2.cols[j]: sub2.typ(sub2.cols[j]) for j in skeep}
            tbl = LTable(cols, _check(rows), types)
            literals = []
    if tbl is None:
        cand: list[int] | None = None
        for d, ids in literals:
            bd = idx.by_dir(d)
            sel: list[int] = []
            for v in ids:
                sel.extend(bd.get(v, ()))
            if cand is None:
                cand = sorted(sel) if len(ids) > 1 else sel
            else:
                ss = set(sel)
                cand = [i for i in cand if i in ss]
        qrows = idx.quads if cand is None else [idx.quads[i] for i in cand]
        tbl = LTable(base_cols, list(qrows))
    for d, vs in joins:
        sub = eval_nodes(idx, vs)
        stags = sub.tags()
        si = sub.col_idx("id")
        di = tbl.col_idx(d)
        if not stags and _is_distinct(vs):
            ids = {r[si] for r in sub.rows}
            tbl = LTable(
                tbl.cols,
                [r for r in tbl.rows if r[di] in ids],
                dict(tbl.types),
            )
        elif not stags:
            from collections import Counter

            cnt = Counter(r[si] for r in sub.rows)
            rows = []
            for r in tbl.rows:
                n = cnt.get(r[di], 0)
                rows.extend([r] * n)
            tbl = LTable(tbl.cols, _check(rows), dict(tbl.types))
        else:
            sub2 = _drop_columns(
                sub, [c for c in sub.cols if c != "id" and c not in stags]
            )
            groups: dict = {}
            s2i = sub2.col_idx("id")
            skeep = [j for j, c in enumerate(sub2.cols) if c != "id"]
            for r in sub2.rows:
                groups.setdefault(r[s2i], []).append(
                    tuple(r[j] for j in skeep)
                )
            rows = []
            for r in tbl.rows:
                for ext in groups.get(r[di], ()):
                    rows.append(r + ext)
            cols = tbl.cols + [sub2.cols[j] for j in skeep]
            types = dict(tbl.types)
            for j in skeep:
                types[sub2.cols[j]] = sub2.typ(sub2.cols[j])
            tbl = LTable(cols, _check(rows), types)
    for d, tags in projections:
        di = tbl.col_idx(d)
        for tname in tags:
            tbl = _with_column(
                tbl, tname, [r[di] for r in tbl.rows], "long"
            )
    for d, tag in qshape.save:
        di = tbl.col_idx(d)
        tbl = _with_column(tbl, tag, [r[di] for r in tbl.rows], "long")
    return tbl


# ---------------- value filters ----------------


def _eval_filter(idx: LocalIndex, shape: S.Filter) -> LTable:
    t = eval_nodes(idx, shape.sub)
    ii = t.col_idx("id")
    preds = [_local_filter_pred(f) for f in shape.filters]
    rows = []
    for r in t.rows:
        nd = idx.nodes.get(r[ii])
        if nd is None:  # inner dictionary join: unknown ids drop
            continue
        if all(p(nd) for p in preds):
            rows.append(r)
    return LTable(t.cols, rows, dict(t.types))


_PY_OPS = {
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
}


def _local_filter_pred(f: S.ValueFilter):
    """Value filter -> predicate over a node-attr dict; mirrors
    compiler._filter_cond's kind-gating exactly."""
    if isinstance(f, S.Comparison):
        op = _PY_OPS[f.op]
        v = f.value
        if isinstance(v, Int):
            gate, fld, lit = "int", "i64", v.v
        elif isinstance(v, Float):
            gate, fld, lit = "float", "f64", v.v
        elif isinstance(v, String):
            gate, fld, lit = "string", "str", v.s
        elif isinstance(v, IRI):
            gate, fld, lit = "iri", "str", v.s
        elif isinstance(v, BNode):
            gate, fld, lit = "bnode", "str", v.s
        elif isinstance(v, Time):
            gate, fld, lit = "time", "ts", v.v
        elif isinstance(v, Bool):
            gate, fld, lit = "bool", "bool", v.v
        else:
            raise Unsupported(f"uncomparable value {v!r}")
        return lambda nd: (
            nd["kind"] == gate
            and nd[fld] is not None
            and op(nd[fld], lit)
        )
    if isinstance(f, S.ValueFilterFunc):
        if f.fn is None:
            # expr-form builds Column trees — distributed only
            raise Unsupported("ValueFilterFunc.expr is not local-evaluable")
        fn = f.fn
        from ..values import parse_term

        return lambda nd: nd["term"] is not None and bool(
            fn(parse_term(nd["term"]))
        )
    if isinstance(f, S.Regexp):
        rx = _re.compile(f.pattern)
        kinds = ("string", "iri", "bnode") if f.refs else ("string",)
        return lambda nd: (
            nd["kind"] in kinds
            and nd["str"] is not None
            and rx.search(nd["str"]) is not None
        )
    if isinstance(f, S.Wildcard):
        pat = _re.escape(f.pattern)
        pat = pat if pat.startswith("%") else "^" + pat
        pat = pat if pat.endswith("%") else pat + "$"
        pat = pat.strip("%").replace("%", ".*").replace(r"\?", ".")
        rx = _re.compile(pat)
        return lambda nd: (
            nd["kind"] in ("string", "iri", "bnode")
            and nd["str"] is not None
            and rx.search(nd["str"]) is not None
        )
    raise Unsupported(f"unknown filter {type(f).__name__}")


# ---------------- recursion ----------------


def _eval_recursive(idx: LocalIndex, shape: S.Recursive) -> LTable:
    """Mirror of compiler._compile_recursive (itself the reference's
    graph/iterator/recursive.go BFS): frontier minus global visited per
    round, depth of first visit, early exit; per-round results sorted
    for determinism (same as _recursive_driver_bfs)."""
    start_t = eval_nodes(idx, shape.sub)
    si = start_t.col_idx("id")
    visited = {r[si] for r in start_t.rows}
    frontier = sorted(visited)
    out_rows: list[tuple] = []
    for depth in range(1, shape.max_depth + 1):
        ft = LTable(["id"], [(i,) for i in frontier])
        nxt_t = eval_nodes(idx, shape.step(_LocalFrontier(ft)))
        ni = nxt_t.col_idx("id")
        nxt = {r[ni] for r in nxt_t.rows} - visited
        if not nxt:
            break
        visited |= nxt
        frontier = sorted(nxt)
        if shape.depth_tag:
            out_rows.extend((n, depth) for n in frontier)
        else:
            out_rows.extend((n,) for n in frontier)
    cols = ["id"] + ([shape.depth_tag] if shape.depth_tag else [])
    types = {shape.depth_tag: "int"} if shape.depth_tag else {}
    return LTable(cols, out_rows, types)


# ---------------- DataFrame bridge ----------------

_ARROW_TYPES = {
    "long": "int64",
    "int": "int32",
    "string": "string",
    "double": "float64",
    "boolean": "bool",
}


def table_to_df(spark, t: LTable):
    """LTable -> DataFrame with the same schema the distributed
    compiler would produce. Goes through a pyarrow Table: Spark turns
    Arrow batches into JVM rows, so downstream jobs (noop sink,
    collect) never launch Python workers — a tuple-list createDataFrame
    costs ~250 ms per job against Arrow's ~70 ms. The local rows ride
    along on the DataFrame object (``_cayley_local``) so
    GraphStore.resolve can render terms driver-side instead of
    launching dictionary-join jobs."""
    import pyarrow as pa

    arrays = []
    fields = []
    for j, c in enumerate(t.cols):
        typ = pa.type_for_alias(_ARROW_TYPES[t.typ(c)])
        arrays.append(pa.array([r[j] for r in t.rows], type=typ))
        fields.append(pa.field(c, typ, nullable=True))
    df = spark.createDataFrame(
        pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    )
    df._cayley_local = t
    return df


def resolve_local(store, df, t: LTable, cols: list[str]):
    """Driver-side twin of GraphStore.resolve for local results."""
    nodes = store._local_index.nodes
    out_cols = list(t.cols)
    positions = {c: j for j, c in enumerate(out_cols)}
    new_rows = []
    resolved = set(cols)
    for r in t.rows:
        new_rows.append(
            tuple(
                (
                    (nodes.get(v) or {}).get("term")
                    if c in resolved
                    else v
                )
                for c, v in zip(out_cols, r)
            )
        )
    types = dict(t.types)
    for c in cols:
        types[c] = "string"
    return table_to_df(store.spark, LTable(out_cols, new_rows, types))


def try_local(store, shape):
    """Evaluate ``shape`` on the store's local index if possible.
    Returns a DataFrame or None (no index / unsupported construct)."""
    idx = getattr(store, "_local_index", None)
    if idx is None:
        return None
    try:
        t = eval_nodes(idx, shape)
    except Unsupported:
        return None
    return table_to_df(store.spark, t)


def _local_values_table(store, shape):
    """Evaluate + render for the values surface: terms resolved,
    internal columns dropped. Returns an LTable or None to decline."""
    idx = getattr(store, "_local_index", None)
    if idx is None:
        return None
    try:
        t = eval_nodes(idx, shape)
    except Unsupported:
        return None
    nodes = idx.nodes
    resolve = [
        j
        for j, c in enumerate(t.cols)
        if not c.startswith("__") and t.typ(c) == "long"
    ]
    keep = [j for j, c in enumerate(t.cols) if not t.cols[j].startswith("__")]
    rset = set(resolve)
    rows = [
        tuple(
            (nodes.get(r[j]) or {}).get("term") if j in rset else r[j]
            for j in keep
        )
        for r in t.rows
    ]
    types = {
        t.cols[j]: ("string" if j in rset else t.typ(t.cols[j])) for j in keep
    }
    return LTable([t.cols[j] for j in keep], rows, types)


def try_local_values(store, shape):
    """Single-pass twin of Path.values_df for local stores: evaluate,
    render terms, drop internal columns — ONE DataFrame bridge instead
    of two (the intermediate id-DataFrame costs ~25 ms of py4j the
    rendered result never uses). Returns None to decline."""
    t = _local_values_table(store, shape)
    if t is None:
        return None
    return table_to_df(store.spark, t)


def try_local_rows(store, shape):
    """Terminal-collect twin of Path.all()/all_values(): the rendered
    result WITHOUT any DataFrame bridge. For a local-engine store the
    rows are already driver-resident, so building a Spark DataFrame
    only to collect it back costs a py4j Arrow conversion + a job
    launch (~25-40 ms) that the caller's list comprehension never
    needed — the memstore reference answers the same query in-process
    in ~the same tens of milliseconds TOTAL. Returns an LTable or
    None to decline (caller falls back to the DataFrame path)."""
    return _local_values_table(store, shape)

"""Shape → DataFrame compiler.

The Spark counterpart of the reference's whole-shape → single-SQL-SELECT
compiler (/root/reference/graph/sql/optimizer.go:80-565): each shape
lowers to a declarative DataFrame transformation and Catalyst/AQE play
the role of the reference's cost-based iterator optimizer
(graph/iterator/and_optimize.go) — join order, broadcast-vs-shuffle,
empty-relation propagation and predicate pushdown are all delegated
(SURVEY.md §4).

Design rules that matter at 100 TB:

- Fixed value sets become *literal* predicates (``col == lit`` /
  ``isin``) — they reach the Parquet scan as PushedFilters, replacing
  the reference's per-direction B-tree indexes.
- An Intersect branch that binds no tags compiles to a LEFT SEMI join
  (the Contains-probe of reference graph/iterator/and.go) — this both
  preserves Cayley's multiplicity semantics (probes never multiply
  rows) and lets Spark build the small hash side.
- Tag bindings are plain columns; NextPath multiplicity (one result row
  per distinct binding combination, reference graph/hasa.go:26-35) falls
  out of join semantics for free.
- Recursion is the one non-relational construct: a driver-side BFS loop
  with per-round ``localCheckpoint()`` to cut lineage growth.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .. import shapes as S
from ..store import GraphStore
from ..values import IRI, BNode, Bool, Float, Int, String, Time
import re


@dataclass(frozen=True)
class _DFShape(S.Shape):
    """Internal: a pre-compiled frontier (used by the recursion loop)."""

    df: object


def tags_of(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c != "id" and not c.startswith("__")]


def bq(name: str):
    """Column reference by EXACT name, backtick-quoted: tag names may
    contain dots (e.g. LinkedQL tags are full property IRIs), which the
    bare-string column parser would treat as struct-field access."""
    return F.col("`" + name + "`")


def compile_nodes(store: GraphStore, shape: S.Shape) -> DataFrame:
    """Lower a node shape to DataFrame[id, *tags].

    Memoized per store: query compilation is driver-side plan
    building through py4j (~1-5 ms per DataFrame call), and real
    queries repeat identical sub-shapes (the same predicate-filtered
    scan appears once per branch of an intersect/union). Shapes are
    frozen dataclasses, so structural equality is exact; embedded
    callables (ValueFilterFunc.fn, Recursive.step) compare by
    identity, which keeps separately-built paths from false-hitting.
    The store is immutable (deltas return a new GraphStore), so a
    cached plan can never go stale."""
    if isinstance(shape, _DFShape):
        return shape.df
    if getattr(store, "_local_index", None) is not None:
        # adaptive small-store path (GraphStore.enable_local): evaluate
        # the whole shape tree driver-side on the collected index — the
        # memstore-analog latency floor. Falls through on unsupported
        # constructs. Not memoized: local evaluation is sub-millisecond
        # and caching would pin result DataFrames for the store's life.
        from .local import try_local

        out = try_local(store, shape)
        if out is not None:
            return out
    cache = getattr(store, "_compile_cache", None)
    if cache is None:
        cache = {}
        store._compile_cache = cache
    if _contains_runtime_df(shape):
        # A shape embedding a pre-compiled DataFrame (the recursion
        # loop's per-round step shapes) hashes by DataFrame identity —
        # it can never hit again, yet a cache entry would pin the
        # localCheckpointed frontier blocks for the store's lifetime
        # (a leak on long-running servers). Compile uncached.
        return _compile_nodes_impl(store, shape)
    try:
        hit = cache.get(shape)
    except TypeError:  # unhashable shape: compile uncached
        return _compile_nodes_impl(store, shape)
    if hit is not None:
        return hit
    df = _compile_nodes_impl(store, shape)
    cache[shape] = df
    return df


def _contains_runtime_df(shape) -> bool:
    """True if the shape tree transitively embeds a runtime DataFrame
    (_DFShape or the local engine's frontier marker) — such shapes are
    compile-memo-uncacheable by construction."""
    from .local import _LocalFrontier

    stack = [shape]
    while stack:
        s = stack.pop()
        if isinstance(s, (_DFShape, _LocalFrontier)):
            return True
        if isinstance(s, tuple):
            stack.extend(s)
        elif isinstance(s, (S.Shape, S.QuadShape, S.QuadFilter)):
            import dataclasses

            if dataclasses.is_dataclass(s):
                for f in dataclasses.fields(s):
                    v = getattr(s, f.name)
                    if isinstance(
                        v, (S.Shape, S.QuadShape, S.QuadFilter, tuple)
                    ):
                        stack.append(v)
    return False


def _compile_nodes_impl(store: GraphStore, shape: S.Shape) -> DataFrame:
    if isinstance(shape, S.AllNodes):
        return store.nodes.select("id")
    if isinstance(shape, S.Fixed):
        ids = [(v.id,) for v in shape.values]
        return store.spark.createDataFrame(ids, "id: long")
    if isinstance(shape, S.NodesFrom):
        q = compile_quads(store, shape.quads)
        keep = [c for c in q.columns if c not in ("s", "p", "o", "l")]
        out = q.select(F.col(shape.dir).alias("id"), *[bq(c) for c in keep])
        if shape.dir == S.LABEL:
            # quads without a label have no label node (reference treats
            # the label ref as absent, not as a null value)
            out = out.where(F.col("id").isNotNull())
        return out
    if isinstance(shape, S.Tag):
        df = compile_nodes(store, shape.sub)
        for t in shape.tags:
            df = df.withColumn(t, F.col("id"))
        return df
    if isinstance(shape, S.Back):
        df = compile_nodes(store, shape.sub)
        return df.withColumn("id", bq(shape.tag))
    if isinstance(shape, S.Intersect):
        return _compile_intersect(store, shape)
    if isinstance(shape, S.Union):
        if shape.short:
            # Short-circuit Or (reference or.go:49-56): branches are
            # evaluated IN ORDER and the first non-empty one is the
            # whole result. Inherently sequential — one isEmpty()
            # action per empty prefix branch, then the winner's plan
            # is returned lazily.
            for s in shape.sub:
                d = compile_nodes(store, s)
                if not d.isEmpty():
                    return d
            return compile_nodes(store, shape.sub[0]).limit(0)
        dfs = [compile_nodes(store, s) for s in shape.sub]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out
    if isinstance(shape, S.Except):
        all_df = compile_nodes(store, shape.all)
        excl = compile_nodes(store, shape.exclude).select("id")
        return all_df.join(excl, "id", "left_anti")
    if isinstance(shape, S.Unique):
        df = compile_nodes(store, shape.sub)
        return df.dropDuplicates(["id"])
    if isinstance(shape, S.Filter):
        return _compile_filter(store, shape)
    if isinstance(shape, S.Page):
        df = compile_nodes(store, shape.sub)
        if shape.skip > 0:
            df = df.offset(shape.skip)
        if shape.limit > 0:
            df = df.limit(shape.limit)
        return df
    if isinstance(shape, S.Sort):
        # Sort by the value's canonical string (reference sort.go:69-75).
        # The __ord column is kept so downstream joins (e.g. result
        # rendering) can re-establish the order at materialization.
        df = compile_nodes(store, shape.sub)
        terms = store.nodes.select("id", F.col("term").alias("__ord"))
        return df.drop("__ord").join(terms, "id", "left").orderBy("__ord")
    if isinstance(shape, S.Count):
        df = compile_nodes(store, shape.sub)
        return df.agg(F.count(F.lit(1)).alias("count"))
    if isinstance(shape, S.Recursive):
        return _compile_recursive(store, shape)
    if isinstance(shape, S.Materialize):
        return compile_nodes(store, shape.sub).persist()
    raise TypeError(f"cannot compile shape {shape!r}")


def _pred_count_map(store: GraphStore) -> dict:
    """Per-predicate quad counts keyed by predicate node id — the
    driver-side mirror of ``GraphStore.predicate_stats`` (reference
    graph/quadstore.go:77-88 Stats), memoized per store. One
    map-side-combined groupBy, dimension-sized result (one row per
    distinct predicate); the store is immutable so the cache can
    never go stale."""
    m = getattr(store, "_pred_count_cache", None)
    if m is None:
        # bounded collect: predicates are dimension-sized in real
        # graphs, but a pathological store (unique predicate per quad)
        # must not stream a quads-sized map to the driver — above the
        # bound, decline stats (estimates become +inf → written order)
        bound = 65536
        rows = (
            store.quads.groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .limit(bound + 1)
            .collect()
        )
        m = (
            {r["p"]: r["n"] for r in rows} if len(rows) <= bound else {}
        )
        store._pred_count_cache = m
    return m


def _estimate_size(store: GraphStore, shape) -> float:
    """Cardinality estimate for a node shape, from predicate
    statistics — the analog of the reference's iterator Size()
    estimates that and_optimize.go:44-88 sorts And branches by.
    Upper-bound flavored: a quad set constrained to a Fixed predicate
    costs that predicate's quad count; each additional Fixed
    constraint on another direction tightens by 10x (the reference's
    Size() is likewise a heuristic, exactness is not the point);
    anything unrecognized is "don't know" = +inf so it never
    outranks a branch we CAN price."""
    if isinstance(shape, S.Fixed):
        return float(len(shape.values))
    if isinstance(shape, S.NodesFrom):
        q = shape.quads
        if not isinstance(q, S.Quads):
            return float("inf")
        m = _pred_count_map(store)
        if not m:  # stats declined (see bound above): don't pretend
            return float("inf")
        est = float(sum(m.values()))
        extra = 0
        for qf in q.filters:
            vs = qf.values
            if not isinstance(vs, S.Fixed):
                fx = _as_fixed(vs)
                vs = fx if fx is not None else vs
            if isinstance(vs, S.Fixed):
                if qf.dir == S.PREDICATE:
                    est = min(
                        est, float(sum(m.get(v.id, 0) for v in vs.values))
                    )
                else:
                    extra += 1
        return est / (10.0 ** extra)
    if isinstance(shape, S.Intersect):
        return min(
            (_estimate_size(store, s) for s in shape.sub),
            default=float("inf"),
        )
    if isinstance(shape, S.Union):
        return sum(_estimate_size(store, s) for s in shape.sub)
    if isinstance(shape, S.Except):
        return _estimate_size(store, shape.all)
    if isinstance(shape, (S.Tag, S.Back, S.Unique, S.Filter)):
        return _estimate_size(store, shape.sub)
    return float("inf")


def _compile_intersect(store: GraphStore, shape: S.Intersect) -> DataFrame:
    # Order: start from the first branch (the reference scans the
    # cheapest; we let AQE reorder, but put Fixed filters first since
    # they are free predicate pushdowns, mirroring shape.go:990-1024's
    # "collect Fixed first"). AllNodes branches are dropped when any
    # other branch exists (shape.go:990-1024 does the same flatten) —
    # this also preserves Cayley's path-multiplicity: the remaining
    # branch drives, per-edge duplicates intact (and.go Contains probes
    # never multiply nor dedup the primary).
    subs = list(shape.sub)
    fixed = [s for s in subs if isinstance(s, S.Fixed)]
    rest = [s for s in subs if not isinstance(s, (S.Fixed, S.AllNodes))]
    if not rest:
        if fixed:
            # membership must still be verified against the store
            # ("find non-existent" semantics): semi-join nodes table
            rest, fixed = [S.AllNodes()], fixed
        else:
            rest = [S.AllNodes()]
    out = compile_nodes(store, rest[0])
    for fx in fixed:
        ids = [v.id for v in fx.values]
        out = out.where(
            F.col("id") == F.lit(ids[0]) if len(ids) == 1 else F.col("id").isin(ids)
        )
    probes = rest[1:]
    if len(probes) > 1:
        probes = _order_probes(store, probes)
    for b in probes:
        bdf = compile_nodes(store, b)
        btags = tags_of(bdf)
        if not btags:
            out = out.join(bdf.select("id"), "id", "left_semi")
        else:
            bdf = bdf.select("id", *[bq(c) for c in btags])
            bdf = bdf.drop(*[c for c in btags if c in out.columns])
            out = out.join(bdf, "id", "inner")
    for opt in shape.optional:
        odf = compile_nodes(store, opt)
        odf = odf.select("id", *[bq(c) for c in tags_of(odf)])
        odf = odf.drop(*[c for c in odf.columns if c != "id" and c in out.columns])
        out = out.join(odf, "id", "left_outer")
    return out


def _order_probes(store: GraphStore, probes: list) -> list:
    """Reference and_optimize.go:44-88: apply the cheapest And
    branches first. The driver branch is fixed (multiplicity follows
    it), and only TAG-FREE probes move — they compile to semi-joins,
    which commute, so sorting them by estimated cardinality (most
    selective first, each shrinking the stream the next one sees) is
    result-identical; tagged probes keep their relative order because
    duplicate tag names resolve by branch order. Stable sort, and any
    failure to price (stats job, odd shapes) keeps the written
    order — ordering is an optimization, never a semantics change."""
    try:
        tagfree = [not _shape_has_tags(b) for b in probes]
        movable = [
            (i, b) for i, b in enumerate(probes) if tagfree[i]
        ]
        if len(movable) < 2:
            return probes
        ordered = sorted(
            movable, key=lambda ib: _estimate_size(store, ib[1])
        )
        # movable probes (sorted) first, then tagged in original order
        return [b for _, b in ordered] + [
            b for i, b in enumerate(probes) if not tagfree[i]
        ]
    except Exception:
        return probes


def _shape_has_tags(shape) -> bool:
    """True if the shape tree binds any tag (Save columns survive
    into the compiled frame and make join order observable)."""
    import dataclasses

    stack = [shape]
    while stack:
        s = stack.pop()
        if isinstance(s, (S.Tag, S.Back)):
            return True
        if isinstance(s, S.Quads) and s.save:
            return True
        if isinstance(s, tuple):
            stack.extend(s)
        elif dataclasses.is_dataclass(s) and not isinstance(s, type):
            for f in dataclasses.fields(s):
                stack.append(getattr(s, f.name))
    return False


def compile_quads(store: GraphStore, qshape: S.QuadShape) -> DataFrame:
    if not isinstance(qshape, S.Quads):
        raise TypeError(f"cannot compile quad shape {qshape!r}")
    df = store.quads
    for qf in qshape.filters:
        df = _apply_quad_filter(store, df, qf)
    for d, tag in qshape.save:
        df = df.withColumn(tag, F.col(d))
    return df


def _apply_quad_filter(store, df: DataFrame, qf: S.QuadFilter) -> DataFrame:
    vs = qf.values
    if isinstance(vs, S.AllNodes):
        return df
    fx = _as_fixed(vs)
    if fx is not None:
        vs = fx
    if isinstance(vs, S.Fixed):
        ids = [v.id for v in vs.values]
        # literal predicate → Parquet pushdown (the "index scan")
        if len(ids) == 1:
            return df.where(F.col(qf.dir) == F.lit(ids[0]))
        return df.where(F.col(qf.dir).isin(ids))
    tags = _pure_tag_chain(vs)
    if tags is not None and qf.dir != S.LABEL:  # null labels ≠ a node
        # Tag(AllNodes) used as a direction constraint (the
        # g.V().As("x").In(...) pattern): every node matches, so the
        # membership join is the identity — binding the tag is a pure
        # projection of the direction column. Kills a quads×nodes join
        # in every tagged full-scan traversal.
        out = df
        for t in tags:
            out = out.withColumn(t, F.col(qf.dir))
        return out
    sub = compile_nodes(store, vs)
    stags = tags_of(sub)
    if not stags and _is_distinct(vs):
        # Provably duplicate-free node set: a semi-join is equivalent
        # and lets Spark build the small hash side without multiplying.
        return df.join(
            sub.select(F.col("id").alias(qf.dir)), qf.dir, "left_semi"
        )
    if not stags:
        # Per-path multiplicity must be preserved: the reference's
        # LinksTo scans the sub-iterator and emits quads once per
        # sub-row (graph/linksto.go:44-53) — duplicates in the frontier
        # multiply. An inner join keeps exactly that bag semantics.
        return df.join(
            sub.select(F.col("id").alias(qf.dir)), qf.dir, "inner"
        )
    # tagged sub-shape: inner join, carry its bindings through the quad
    sub = sub.withColumnRenamed("id", "__join_id")
    out = df.join(sub, df[qf.dir] == F.col("__join_id"), "inner").drop("__join_id")
    return out


def _pure_tag_chain(shape: S.Shape) -> list[str] | None:
    """If shape is Tag(...(Tag(AllNodes))), return the tag names
    (outermost last); else None."""
    tags: list[str] = []
    while isinstance(shape, S.Tag):
        tags = list(shape.tags) + tags
        shape = shape.sub
    return tags if tags and isinstance(shape, S.AllNodes) else None


def _is_distinct(shape: S.Shape) -> bool:
    """True iff the shape's output provably has unique node ids (so a
    semi-join against it cannot change multiplicities). Conservative:
    unknown shapes return False and compile to multiplicity-preserving
    inner joins."""
    if isinstance(shape, (S.AllNodes, S.Fixed, S.Unique, S.Recursive, S.Count)):
        return True
    if isinstance(shape, (S.Filter, S.Page, S.Sort, S.Materialize, S.Tag)):
        return _is_distinct(shape.sub)
    if isinstance(shape, S.Intersect):
        return all(_is_distinct(s) for s in shape.sub) and all(
            _is_distinct(s) for s in shape.optional
        )
    return False


def _as_fixed(shape: S.Shape) -> S.Fixed | None:
    """Normalize ``Intersect((AllNodes, Fixed))`` (the Is-on-start
    pattern) back to the bare Fixed when used as a quad-direction
    constraint: hash-equality inside a quad already implies membership,
    so the membership semi-join is redundant and the constraint becomes
    a literal pushdown predicate."""
    if isinstance(shape, S.Fixed):
        return shape
    if isinstance(shape, S.Intersect) and not shape.optional:
        fixed = [s for s in shape.sub if isinstance(s, S.Fixed)]
        rest = [
            s
            for s in shape.sub
            if not isinstance(s, (S.Fixed, S.AllNodes))
        ]
        if len(fixed) == 1 and not rest:
            return fixed[0]
    return None


def _compile_filter(store: GraphStore, shape: S.Filter) -> DataFrame:
    df = compile_nodes(store, shape.sub)
    orig = df.columns
    nd = store.nodes.select(
        "id",
        "kind",
        F.col("str").alias("__str"),
        "i64",
        "f64",
        "bool",
        "ts",
        F.col("term").alias("__term"),
    )
    j = df.join(nd, "id", "inner")
    for f in shape.filters:
        j = j.where(_filter_cond(f))
    return j.select(*[bq(c) for c in orig])


_OPS = {
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
}


def _filter_cond(f: S.ValueFilter):
    kind = F.col("kind")
    if isinstance(f, S.Comparison):
        op = _OPS[f.op]
        v = f.value
        # Kind-gating (reference value_comparison.go:62-99): a typed
        # comparison silently drops values of any other kind — no
        # cross-type coercion, unlike SQL.
        if isinstance(v, Int):
            return (kind == "int") & op(F.col("i64"), F.lit(v.v))
        if isinstance(v, Float):
            return (kind == "float") & op(F.col("f64"), F.lit(v.v))
        if isinstance(v, String):
            return (kind == "string") & op(F.col("__str"), F.lit(v.s))
        if isinstance(v, IRI):
            return (kind == "iri") & op(F.col("__str"), F.lit(v.s))
        if isinstance(v, BNode):
            return (kind == "bnode") & op(F.col("__str"), F.lit(v.s))
        if isinstance(v, Time):
            return (kind == "time") & op(F.col("ts"), F.lit(v.v))
        if isinstance(v, Bool):
            return (kind == "bool") & op(F.col("bool"), F.lit(v.v))
        raise TypeError(f"uncomparable value {v!r}")
    if isinstance(f, S.ValueFilterFunc):
        if f.expr is not None:
            # JVM-side fast path: predicate over dictionary columns
            return f.expr(
                {
                    "kind": kind,
                    "str": F.col("__str"),
                    "i64": F.col("i64"),
                    "f64": F.col("f64"),
                    "bool": F.col("bool"),
                    "ts": F.col("ts"),
                    "term": F.col("__term"),
                }
            )
        # general fallback: Value -> bool via Arrow-batched pandas UDF
        # over the rendered term (reference value_filter.go applies the
        # func per iterated value — here per Arrow batch)
        fn = f.fn

        @F.pandas_udf("boolean")
        def _pred(terms):
            from ..values import parse_term

            return terms.map(lambda t: bool(fn(parse_term(t))))

        return _pred(F.col("__term"))
    if isinstance(f, S.Regexp):
        base = F.col("__str").rlike(f.pattern)
        if f.refs:
            return kind.isin("string", "iri", "bnode") & base
        return (kind == "string") & base
    if isinstance(f, S.Wildcard):
        # reference shape.go:376-407: wildcard compiles to an anchored
        # regex evaluated WITH refs (IRIs/BNodes match too)
        pat = re.escape(f.pattern)
        pat = pat if pat.startswith("%") else "^" + pat
        pat = pat if pat.endswith("%") else pat + "$"
        pat = pat.strip("%").replace("%", ".*").replace(r"\?", ".")
        return kind.isin("string", "iri", "bnode") & F.col("__str").rlike(pat)
    raise TypeError(f"unknown filter {f!r}")


_SEEN_COLLAPSE_EVERY = 16


#: max edge-slice rows (and start-set rows) the driver-side BFS may
#: collect; above it the distributed loop runs. Overridable via the
#: spark conf of the same name.
_RECURSIVE_COLLECT_BUDGET = 2_000_000


def _recursive_driver_bfs(store, shape: S.Recursive, start: DataFrame):
    """Adaptive fast path for predicate-hop recursion: when the via
    predicate's edge slice is small (measured — same adaptive-pricing
    pattern as functions/dedup.ngram_jaccard_pairs), collect the
    (from,to) pairs once and run the BFS on the driver: 2 Spark jobs
    instead of one per depth level. A 24-deep chain then costs
    milliseconds instead of 24 sequential job launches — which is how
    the reference's in-memory BFS (graph/iterator/recursive.go)
    behaves on small graphs — while large slices (the 100 TB case)
    keep the distributed frontier loop. Returns None to decline."""
    frm, to, pids = shape.via_hop
    budget = int(
        store.spark.conf.get(
            "spark.cayley.recursive.collectBudget",
            str(_RECURSIVE_COLLECT_BUDGET),
        )
    )
    if budget <= 0:
        return None
    edges = store.quads
    if pids is not None:
        edges = edges.where(
            F.col("p") == F.lit(pids[0])
            if len(pids) == 1
            else F.col("p").isin(list(pids))
        )
    edges = edges.select(F.col(frm).alias("f"), F.col(to).alias("t"))
    # Price BEFORE shipping: limit(budget+1).count() is a pushed-down
    # early-stopping job that moves ZERO rows to the driver — the
    # decline path costs one cheap count, and the accept path fetches
    # via Arrow batches instead of multi-GB of pickled Row objects.
    if edges.limit(budget + 1).count() > budget:
        return None
    if start.limit(budget + 1).count() > budget:
        return None
    et = edges.toArrow()
    adj: dict[int, list[int]] = {}
    for f, t in zip(et.column("f").to_pylist(), et.column("t").to_pylist()):
        adj.setdefault(f, []).append(t)
    visited = set(start.toArrow().column("id").to_pylist())
    frontier = list(visited)
    result: list[tuple] = []
    for depth in range(1, shape.max_depth + 1):
        nxt: set[int] = set()
        for f in frontier:
            for t in adj.get(f, ()):
                if t not in visited:
                    nxt.add(t)
        if not nxt:
            break
        visited |= nxt
        frontier = list(nxt)
        result.extend(
            (n, depth) if shape.depth_tag else (n,) for n in sorted(nxt)
        )
    schema = "id: long" + (
        f", {shape.depth_tag}: int" if shape.depth_tag else ""
    )
    return store.spark.createDataFrame(result, schema)


def _compile_recursive(store: GraphStore, shape: S.Recursive) -> DataFrame:
    """BFS transitive closure (reference graph/iterator/recursive.go:
    140-193): frontier minus global visited set per round, depth of
    first visit, early exit on empty frontier.

    One Spark job per round: the frontier is LAZILY localCheckpointed
    and the empty-test count() materializes its blocks and truncates
    lineage within that same job (an eager checkpoint + count costs
    two job launches per round — measured as ~half the traversal
    latency on deep chains). Every _SEEN_COLLAPSE_EVERY rounds the
    growing `seen` union is collapsed the same way, so the anti-join
    plan stays shallow on unbounded traversals; if the session has a
    checkpoint directory configured (sc.setCheckpointDir — the
    cluster deployment mode), the collapse uses a RELIABLE checkpoint
    instead, so a lost executor cannot kill a deep traversal
    (localCheckpoint blocks are unreplicated by design)."""
    sc = store.spark.sparkContext
    start = compile_nodes(store, shape.sub).select("id").dropDuplicates(["id"])
    if shape.via_hop is not None:
        out = _recursive_driver_bfs(store, shape, start)
        if out is not None:
            return out
    frontier = start.localCheckpoint(eager=True)
    seen = frontier
    rounds: list[DataFrame] = []
    since_collapse = 0
    for depth in range(1, shape.max_depth + 1):
        nxt = compile_nodes(store, shape.step(_DFShape(frontier)))
        nxt = nxt.select("id").dropDuplicates(["id"])
        nxt = nxt.join(seen, "id", "left_anti").localCheckpoint(eager=False)
        if nxt.count() == 0:
            break
        if shape.depth_tag:
            rounds.append(nxt.withColumn(shape.depth_tag, F.lit(depth)))
        else:
            rounds.append(nxt)
        seen = seen.unionAll(nxt)
        since_collapse += 1
        if since_collapse >= _SEEN_COLLAPSE_EVERY:
            since_collapse = 0
            if sc.getCheckpointDir() is not None:
                seen = seen.checkpoint(eager=True)
            else:
                # lazy: next round's anti-join job materializes it
                seen = seen.localCheckpoint(eager=False)
        frontier = nxt
    if not rounds:
        empty_schema = "id: long" + (
            f", {shape.depth_tag}: int" if shape.depth_tag else ""
        )
        return store.spark.createDataFrame([], empty_schema)
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionAll(r)
    return out

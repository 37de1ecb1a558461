"""Differential fuzz: the local engine vs the distributed compiler.

The two engines share one logical IR (shapes.py) and must agree on
every query. The corpus tests pin known answers; this module pins the
ENGINES TO EACH OTHER on randomized graphs and randomized path
queries — the strongest guard against semantic drift in either
implementation (multiplicity, tag merge, optional nulls, filter
kind-gating, recursion frontiers).

Hypothesis runs derandomized (fixed seed) so CI is stable; bump
``CAYLEY_FUZZ_EXAMPLES`` (env) locally when hunting — e.g. 200 for
the certification run recorded in COVERAGE.md."""

import os
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from cayley_spark import GraphStore, IRI, Path
from cayley_spark import shapes as S

N_EXAMPLES = int(os.environ.get("CAYLEY_FUZZ_EXAMPLES", "25"))

NODES = [IRI(f"n{i}") for i in range(8)]
PREDS = [IRI("p0"), IRI("p1"), IRI("p2")]
LABELS = [IRI("g1"), IRI("g2")]

# typed literal objects: drive the Comparison/Wildcard kind-gating
# paths through both engines (an IRI must never match an Int filter)
from cayley_spark import Int, String  # noqa: E402

LITS = [Int(1), Int(5), Int(9), String("n3"), String("zed")]


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=3, max_value=18))
    quads = []
    for _ in range(n):
        s = draw(st.sampled_from(NODES))
        p = draw(st.sampled_from(PREDS))
        o = draw(st.sampled_from(NODES + LITS))
        # ~half the quads live in a named graph so LabelContext has
        # real work to do (reference query/path/path.go:52-61)
        lab = draw(st.sampled_from([None, None, *LABELS]))
        quads.append((s, p, o) if lab is None else (s, p, o, lab))
    return tuple(quads)


@st.composite
def paths(draw):
    """A random op chain starting from a random (possibly fixed) set."""
    start = draw(
        st.lists(st.sampled_from(NODES), min_size=0, max_size=2, unique=True)
    )
    ops = []
    for _ in range(draw(st.integers(min_value=1, max_value=4))):
        kind = draw(
            st.sampled_from(
                [
                    "out", "in", "both", "has", "tag", "save",
                    "union", "intersect", "except", "unique",
                    "regex", "optional_save", "cmp", "like",
                    "label_ctx", "recursive",
                ]
            )
        )
        if kind in ("out", "in", "both"):
            preds = draw(
                st.one_of(st.none(), st.sampled_from(PREDS))
            )
            ops.append((kind, preds))
        elif kind == "has":
            ops.append((kind, draw(st.sampled_from(PREDS)),
                        draw(st.sampled_from(NODES))))
        elif kind == "tag":
            ops.append((kind, draw(st.sampled_from(["a", "b"]))))
        elif kind in ("save", "optional_save"):
            ops.append((kind, draw(st.sampled_from(PREDS)),
                        draw(st.sampled_from(["sv", "sw"]))))
        elif kind in ("union", "intersect", "except"):
            ops.append((kind, draw(st.sampled_from(PREDS)),
                        draw(st.sampled_from(NODES))))
        elif kind == "regex":
            ops.append((kind, draw(st.sampled_from(["n[0-3]", "n.*"]))))
        elif kind == "cmp":
            ops.append((kind, draw(st.sampled_from(["lt", "lte", "gt", "gte"])),
                        draw(st.sampled_from([1, 5, 9]))))
        elif kind == "like":
            ops.append((kind, draw(st.sampled_from(["n%", "%3", "n?"]))))
        elif kind == "label_ctx":
            # a specific named graph, or None = reset to all labels
            ops.append((kind, draw(st.sampled_from([*LABELS, None]))))
        elif kind == "recursive":
            ops.append(
                (
                    kind,
                    draw(st.sampled_from(PREDS)),
                    draw(st.integers(min_value=1, max_value=4)),
                    draw(st.sampled_from(["d", None])),
                )
            )
        else:
            ops.append((kind,))
    return (tuple(start), tuple(ops))


def build_path(store, spec):
    start, ops = spec
    p = Path.start(store, *start)
    for op in ops:
        kind = op[0]
        if kind == "out":
            p = p.out(*([op[1]] if op[1] else []))
        elif kind == "in":
            p = p.in_(*([op[1]] if op[1] else []))
        elif kind == "both":
            p = p.both(*([op[1]] if op[1] else []))
        elif kind == "has":
            p = p.has(op[1], op[2])
        elif kind == "tag":
            p = p.tag(op[1])
        elif kind == "save":
            p = p.save(op[1], op[2])
        elif kind == "optional_save":
            p = p.save_opt(op[1], op[2])
        elif kind == "union":
            p = p.or_(Path.start(store, op[2]).out(op[1]))
        elif kind == "intersect":
            p = p.and_(Path.start(store, op[2]).both(op[1]))
        elif kind == "except":
            p = p.except_(Path.start(store, op[2]).out(op[1]))
        elif kind == "unique":
            p = p.unique()
        elif kind == "regex":
            p = p.regex(op[1], refs=True)
        elif kind == "cmp":
            from cayley_spark import Int
            p = p.filter(S.Comparison(op[1], Int(op[2])))
        elif kind == "like":
            p = p.like(op[1])
        elif kind == "label_ctx":
            p = p.label_context(op[1]) if op[1] is not None else p.label_context()
        elif kind == "recursive":
            p = p.follow_recursive(
                op[1], max_depth=op[2], depth_tag=op[3]
            )
    return p


def rows_multiset(path):
    return Counter(
        tuple(sorted(r.items(), key=lambda kv: kv[0])) for r in path.all()
    )


@pytest.fixture(scope="module")
def session(spark):
    return spark


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(g=graphs(), spec=paths())
def test_engines_agree(session, g, spec):
    dist = GraphStore.from_quad_values(session, list(g))
    local = GraphStore.from_quad_values(session, list(g)).enable_local()
    assert getattr(local, "_local_index", None) is not None
    got_d = rows_multiset(build_path(dist, spec))
    got_l = rows_multiset(build_path(local, spec))
    assert got_d == got_l, f"engines diverge on {spec!r}\ngraph={g!r}"


@settings(
    max_examples=max(10, N_EXAMPLES // 2),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(g=graphs(), start=st.sampled_from(NODES), pred=st.sampled_from(PREDS))
def test_engines_agree_recursive(session, g, start, pred):
    """FollowRecursive with depth tags: driver BFS, distributed loop,
    and local engine must produce identical (node, depth) sets."""
    dist = GraphStore.from_quad_values(session, list(g))
    local = GraphStore.from_quad_values(session, list(g)).enable_local()

    def run(store):
        return sorted(
            (r["id"], r["d"])
            for r in Path.start(store, start)
            .follow_recursive(pred, depth_tag="d")
            .all()
        )

    assert run(dist) == run(local)


# ---------------- write-path fuzz (ApplyDeltas / refcounts) ----------


@st.composite
def quad_gen(draw):
    s = draw(st.sampled_from(NODES))
    p = draw(st.sampled_from(PREDS))
    o = draw(st.sampled_from(NODES + LITS))
    lab = draw(st.sampled_from([None, None, *LABELS]))
    return (s, p, o) if lab is None else (s, p, o, lab)


@st.composite
def delta_scripts(draw):
    """Initial graph + 1-3 delta rounds of adds, deletes, and node
    removals. Deletes are usually an index into the quads seen so far
    (high hit rate, incl. re-add-after-delete chains) and sometimes a
    random quad (miss / never-existed paths through orphan detection).
    RemoveNode ops (reference writer/single.go:84-113: delete via
    every incident direction) usually index a value seen in a quad so
    far — subject, predicate, object, literal, or label positions all
    reachable — and sometimes name a random value (absent-node
    no-op path)."""
    base = draw(graphs())
    rounds = []
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        adds = tuple(
            draw(quad_gen()) for _ in range(draw(st.integers(0, 4)))
        )
        dels = tuple(
            ("idx", draw(st.integers(0, 63)))
            if draw(st.booleans())
            else ("quad", draw(quad_gen()))
            for _ in range(draw(st.integers(0, 3)))
        )
        removes = tuple(
            ("idx", draw(st.integers(0, 255)))
            if draw(st.booleans())
            else ("val", draw(st.sampled_from(NODES + LITS + LABELS)))
            for _ in range(draw(st.integers(0, 1)))
        )
        rounds.append((adds, dels, removes))
    qn = draw(st.sampled_from(NODES))
    qp = draw(st.sampled_from(PREDS))
    return base, tuple(rounds), qn, qp


def _key(q):
    from cayley_spark.values import coerce

    vals = [coerce(x) for x in q]
    return (
        vals[0].id,
        vals[1].id,
        vals[2].id,
        vals[3].id if len(vals) == 4 else None,
    )


@settings(
    max_examples=max(10, N_EXAMPLES // 2),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(script=delta_scripts())
def test_write_path_engines_and_model_agree(session, script):
    """ApplyDeltas fuzz (reference writer/single.go:84-113 semantics):
    after every randomized add/delete round, BOTH engines must agree
    with each other AND with a pure-python model of the quad bag —
    duplicate adds kept (bag), a delete removes every copy of the
    exact (s,p,o,l)-null-safe match, RemoveNode drops every quad
    incident to the value in ANY direction (writer/single.go:84-113),
    and orphaned nodes disappear from AllNodes (refcount
    maintenance)."""
    from cayley_spark.values import coerce

    base, rounds, qn, qp = script
    cur = GraphStore.from_quad_values(session, list(base))
    bag = list(base)   # model: one entry per surviving quad copy
    seen = list(base)  # all quads ever added (delete-index pool)
    for adds, dels, removes in rounds:
        del_quads = []
        for kind, v in dels:
            if kind == "idx":
                if seen:
                    del_quads.append(seen[v % len(seen)])
            else:
                del_quads.append(v)
        cur = cur.apply_deltas(add=list(adds), delete=del_quads)
        bag.extend(adds)
        seen.extend(adds)
        if del_quads:
            gone = {_key(q) for q in del_quads}
            bag = [q for q in bag if _key(q) not in gone]
        for kind, v in removes:
            if kind == "idx":
                pool = [x for q in seen for x in q if x is not None]
                if not pool:
                    continue
                v = pool[v % len(pool)]
            cur = cur.remove_node(v)
            vid = coerce(v).id
            bag = [q for q in bag if vid not in _key(q)]

        dist = cur
        local = GraphStore(session, cur.nodes, cur.quads).enable_local()
        assert getattr(local, "_local_index", None) is not None

        # AllNodes: the node dictionary tracks surviving references
        model_nodes = {
            coerce(x).id for q in bag for x in q if x is not None
        }
        alln_d = sorted(r["id"] for r in Path.start(dist).all())
        alln_l = sorted(r["id"] for r in Path.start(local).all())
        assert alln_d == alln_l, f"AllNodes diverge after {script!r}"
        assert len(alln_d) == len(model_nodes), (
            f"refcount drift: {len(alln_d)} nodes vs model "
            f"{len(model_nodes)} after {script!r}"
        )

        # one hop with per-copy multiplicity
        out_d = rows_multiset(Path.start(dist, qn).out(qp))
        out_l = rows_multiset(Path.start(local, qn).out(qp))
        assert out_d == out_l, f"out() diverges after {script!r}"
        nk, pk = coerce(qn).id, coerce(qp).id
        model_hits = sum(
            1 for q in bag if _key(q)[0] == nk and _key(q)[1] == pk
        )
        assert sum(out_d.values()) == model_hits, (
            f"multiplicity drift after {script!r}"
        )

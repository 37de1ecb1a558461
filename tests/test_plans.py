"""Physical-plan audits: the scale properties the engine is designed
around, asserted against `.explain` output so they cannot silently
regress.

These are the properties that matter at 100 TB: literal predicates
must reach the Parquet scan as pushed filters, projections must prune
the read schema, small dimension joins must broadcast, and operators
that promise "one scan" or "no cartesian product" must keep it.
"""

from __future__ import annotations

import pytest


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    return E


def test_q6_filters_push_to_parquet_scan(spark, entry):
    """q6's date/discount/quantity predicates must reach the scan."""
    df = entry.q6(spark, SF)  # retired registry single; plan unchanged inside q_tpch_scalar
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_quantity" in pushed and "l_discount" in pushed


def test_t_tokens_prunes_columns(spark, entry):
    """token counting reads only (doc_id, text) — not the whole
    documents schema."""
    df = entry.queries()["t_tokens"](spark, SF)
    plan = plan_of(df)
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "source" not in read and "n_chars" not in read


def test_s_knn_broadcasts_queries(spark, entry):
    """brute-force top-k: the tiny query side broadcasts; the corpus
    is scanned once, never joined shuffle-to-shuffle."""
    df = entry.queries()["s_knn"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_products_anywhere(spark, entry):
    """EVERY registered query must compile free of (a) cartesian
    products (the all-pairs anti-pattern) and (b) row-at-a-time
    Python execution (BatchEvalPython — only Arrow-vectorized
    Python is allowed, and only where documented). Swept over the
    whole registry so a new query cannot regress silently.
    BroadcastNestedLoopJoin is permitted: it only appears here for
    1-row scalar-aggregate broadcasts (q11/q15/q22-style scalar
    subqueries), which are size-bounded by construction."""
    queries = entry.queries()
    for name, fn in queries.items():
        plan = plan_of(fn(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_hop_literal_predicate_prunes(spark, entry):
    """A predicate-constrained hop compiles to a literal filter on
    the quads relation (the index-scan equivalent), not a join
    against a predicate set."""
    from cayley_spark import IRI, Path
    from cayley_spark.graphs.tpch import tpch_graph

    g = tpch_graph(spark, SF)
    df = Path.start(g, IRI("nation:7")).in_(IRI("in_nation")).df()
    opt = optimized_of(df)
    # both the node literal and the predicate literal are folded into
    # plain filters (no membership join, no shuffle join for the hop)
    assert "Filter ((o#" in opt or "Filter ((p#" in opt, opt
    assert "SortMergeJoin" not in plan_of(df)


def test_exact_dedup_single_shuffle(spark, entry):
    """Exact dedup is one hash aggregation: exactly one exchange
    (plus none for the scan)."""
    df = entry.queries()["d_exact"](spark, SF)
    plan = plan_of(df)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan  # partial agg + final agg boundary
    assert "HashAggregate" in plan


def test_q_asof_has_no_join_node(spark, entry):
    """as-of compiles to union + running window — a Join node would
    mean the inequality-join trap came back."""
    df = entry.queries()["q_asof"](spark, SF)
    assert "Join" not in plan_of(df)


def test_q_range_is_equi_join(spark, entry):
    """range join must be a hash/sort-merge equi-join on the bucket,
    never a broadcast nested loop over all pairs."""
    df = entry.queries()["q_range"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tfidf_prunes_columns(spark, entry):
    """tf-idf reads only (doc_id, text) from the documents scan."""
    df = entry.queries()["t_tfidf"](spark, SF)
    plan = plan_of(df)
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "source" not in read


def test_pagerank_no_cartesian(spark, entry):
    """each pagerank iteration is keyed joins + one aggregate."""
    df = entry.queries()["g_pagerank"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_uses_range_partitioning_not_single_task(spark, entry):
    """sequence packing must distribute via range partitioning — a
    SinglePartition window (the Window.orderBy-without-partitionBy
    trap) would serialize the whole corpus through one task."""
    df = entry.queries()["t_pack"](spark, SF)
    plan = plan_of(df)
    # the range exchange itself sits above the localCheckpoint
    # boundary (Scan ExistingRDD); what must hold downstream is that
    # the cumsum window is partitioned by __pid — never a global
    # SinglePartition sort
    assert "windowspecdefinition(__pid" in plan
    assert "SinglePartition" not in plan


def test_q4_compiles_to_semi_join(spark, entry):
    """the EXISTS predicate must become a semi join, not a full join
    plus dedup of multiplied rows."""
    df = entry.q4(spark, SF)  # retired registry single; plan unchanged inside q_tpch_exists
    assert "LeftSemi" in plan_of(df)


def test_intersect_probe_order_follows_predicate_stats(spark):
    """Reference and_optimize.go:44-88: cheapest And branch probes
    first. Tag-free probes (semi-joins, which commute) are sorted by
    the per-predicate quad statistics; the driver branch and tagged
    probes never move (multiplicity and tag precedence follow branch
    order). Results are identical either way — ordering is pure plan
    shaping."""
    from cayley_spark import GraphStore, IRI
    from cayley_spark import shapes as S
    from cayley_spark.plans.compiler import (
        _estimate_size,
        _order_probes,
        compile_nodes,
    )

    quads = [
        (IRI(f"s{i}"), IRI("common"), IRI(f"o{i % 5}")) for i in range(60)
    ]
    quads += [
        (IRI("s1"), IRI("rare"), IRI("o1")),
        (IRI("s2"), IRI("rare"), IRI("o1")),
    ]
    st = GraphStore.from_quad_values(spark, quads).persist()

    def probe(pred, d="s"):
        return S.NodesFrom(
            d, S.Quads(filters=(S.QuadFilter("p", S.Fixed((IRI(pred),))),))
        )

    common, rare = probe("common"), probe("rare")
    assert _estimate_size(st, rare) == 2.0
    assert _estimate_size(st, common) == 62.0 or _estimate_size(st, common) == 60.0
    assert _order_probes(st, [common, rare]) == [rare, common]
    # tagged probes keep their (relative) position at the end
    tagged = S.Tag(common, ("t",))
    assert _order_probes(st, [tagged, common, rare]) == [rare, common, tagged]
    # end-to-end: the compiled intersect is branch-order-independent
    driver = probe("common", d="s")
    a = compile_nodes(st, S.Intersect((driver, common, rare)))
    b = compile_nodes(st, S.Intersect((driver, rare, common)))
    assert sorted(r["id"] for r in a.collect()) == sorted(
        r["id"] for r in b.collect()
    )
    assert len(a.collect()) > 0


def test_qscore_broadcasts_model_single_id_shuffle(spark, entry):
    """hashed_linear_score: the 8192-row weight table must broadcast
    (never a shuffled join against the corpus features), and the only
    hash exchange moving corpus rows is the per-doc aggregation."""
    df = entry.queries()["t_qscore"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exchanges: feature->agg (plus AQE coalesces); no join shuffle
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_kmv_no_corpus_shuffle_before_kernel(spark, entry):
    """kmv_build: the corpus flows straight into the per-partition
    Arrow kernel — no Exchange between the scan and mapInPandas (the
    O(k)-state property that makes the sketch cheaper than a distinct
    at 100 TB)."""
    df = entry.queries()["t_kmv"](spark, SF)
    plan = plan_of(df)
    k_at = plan.find("MapInPandas")
    assert k_at != -1
    # the kernel's child subtree (between MapInPandas and its feeding
    # scan in the flattened dump) must contain no HASH exchange — the
    # corpus is never shuffled to build the sketch. (_t_wide's
    # round-robin repartition is the documented test-rig equalizer
    # for single-row-group testdata files, a no-op at real scale.)
    tail = plan[k_at:]
    scan_at = tail.find("Scan parquet")
    assert scan_at != -1
    assert "Exchange hashpartitioning" not in tail[:scan_at], tail[:scan_at]


def test_perplexity_model_joins_not_cartesian(spark, entry):
    """lm_perplexity: the vocabulary scalar arrives as a 1-row
    broadcast; no CartesianProduct, no SortMergeJoin against the
    1-row side."""
    df = entry.queries()["t_perplexity"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_perplexity_ext_scores_via_broadcast_model(spark, entry):
    """t_perplexity_ext (CCNet split): the corpus-side scoring join
    against the reference-trained model is a BroadcastHashJoin — the
    100 TB path never shuffles the target corpus onto trigram keys.
    The plan root down to that join must contain no SortMergeJoin
    (a model-sized SMJ deeper in the TRAINING subtree is fine)."""
    df = entry.queries()["t_perplexity_ext"](spark, SF)
    plan = plan_of(df)
    at = plan.find("BroadcastHashJoin")
    assert at != -1
    assert "SortMergeJoin" not in plan[:at]
    assert "CartesianProduct" not in plan


def test_gopher_lines_is_pure_expressions(spark, entry):
    """t_gopher_lines: line-rule verdicts are scan-speed column
    expressions — no join, no hash exchange anywhere (the only
    exchange is _t_wide's documented round-robin test-rig
    equalizer)."""
    df = entry.queries()["t_gopher_lines"](spark, SF)
    plan = plan_of(df)
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_c4_is_pure_expressions(spark, entry):
    """t_c4: the whole battery including clean_text reassembly is
    column expressions — no join, no hash exchange."""
    df = entry.queries()["t_c4"](spark, SF)
    plan = plan_of(df)
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_battery_structs_tokenize_once_and_prune(spark, entry):
    """The quality batteries bind their expensive shared arrays once
    per row (r16: the stacked-column form inlined the tokenization
    24x into t_gopher's projection — no cross-column CSE over
    CodegenFallback HOFs; −67% warm on a compute-bound corpus). And
    the token/line rule families ride SEPARATE bound structs, so a
    line-rules-only consumer (t_gopher_lines) still prunes the
    tokenization entirely."""
    plan = plan_of(entry.queries()["t_gopher"](spark, SF))
    assert plan.count("regexp_extract_all") == 1, plan
    lines_plan = plan_of(entry.queries()["t_gopher_lines"](spark, SF))
    assert "regexp_extract_all" not in lines_plan, lines_plan
    c4_plan = plan_of(entry.queries()["t_c4"](spark, SF))
    assert c4_plan.count("regexp_extract_all") == 1, c4_plan


def test_substr_dedup_no_pair_join_bounded_shuffles(spark, entry):
    """d_substr (ExactSubstr): documents must never pair with each
    other — no cartesian/nested-loop — and the whole keep-one plan
    is window-key + id-key shuffles only: one groupBy(g), the g-key
    join back (riding the agg's partitioning), one starts collect
    and the id-keyed trim join — bounded by 5 hash exchanges."""
    df = entry.queries()["d_substr"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # r11 bound was 5; the r12 hot-window guard adds its sampled
    # candidate count, the hot (cnt, keeper) aggregate, and the
    # hot-hits branch's id shuffle — all tiny or AQE-pruned when no
    # key is hot; the guard joins themselves must broadcast, never
    # reshuffle the occurrence stream
    assert plan.count("Exchange hashpartitioning") <= 9, plan
    assert "BroadcastExchange" in plan
    # (cnt, keeper) ride ONE window-key shuffle via an analytic
    # window — the r11 rewrite that halved the shuffle volume; a
    # regression to groupBy + join-back would drop the Window node
    assert "Window" in plan


def test_rep_ngrams_single_gram_shuffle(spark, entry):
    """t_rep_ngrams: all nine n ride ONE explode and ONE
    (id, n, gram) window shuffle — no join between gram frames, no
    cartesian; the top/dup aggregates and the base join-back are the
    only other exchanges (bounded)."""
    df = entry.queries()["t_rep_ngrams"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    # one fused (id, n) aggregate serves BOTH rule families — the
    # unfused two-branch form recomputed the explode+window subtree
    # (2 Window nodes / 6 exchanges); keep it fused
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_entropy_final_agg_rides_window_partitioning(spark, entry):
    """t_entropy: exactly two hash exchanges — the (id, token) count
    shuffle and the per-doc window — and the final groupBy(id) rides
    the window's id partitioning instead of adding a third."""
    df = entry.queries()["t_entropy"](spark, SF)
    plan = plan_of(df)
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_pipeline_never_rescans_raw_text(spark, entry):
    """p_pipeline (corpus_pipeline): every raw-corpus read flows
    through a persisted frame. The optimized plan must contain ZERO
    raw parquet relations outside InMemoryRelation nodes — the
    scan-speed filters fuse into the one cached survivor scan, and
    the mixture input is cached so source_mixture's triple
    self-reference (counts, totals, hash-filter join) cannot
    re-execute the decontamination anti-join lineage (measured as 3
    duplicate benchmark scans before the fix). At most two DISTINCT
    cached plans read raw parquet at all: the corpus survivor frame
    and the benchmark-slice lineage inside the mixture cache."""
    df = entry.queries()["p_pipeline"](spark, SF)

    raw = []

    def walk(node):
        name = node.nodeName()
        if name == "InMemoryRelation":
            return
        if name == "LogicalRelation":
            raw.append(node)
            return
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    assert raw == [], f"{len(raw)} raw scans escape the caches"

    from cayley_spark.functions._cache import unpersist_intermediates

    unpersist_intermediates(df)


def test_jaccard_sizes_cached_for_both_join_sides(spark, entry):
    """ngram_jaccard_pairs persists the per-doc set-size frame and
    materializes it once; the na/nb verification joins must both read
    the InMemoryRelation instead of re-running the groupBy over the
    postings cache (r15: the two aggregates raced, 2.3x A/B win)."""
    import re

    df = entry.queries()["d_jaccard"](spark, SF)
    plan = optimized_of(df)
    # no LIVE aggregate over (blk, id): the only live Aggregate is the
    # intersection count over (id_a, id_b). The set-size groupBys may
    # only appear inside InMemoryRelation stored lineage.
    assert "Aggregate [blk" not in plan, plan
    # both join sides read the cached sizes frame (output column n)
    sizes_refs = re.findall(r"InMemoryRelation \[[^\]]*\bn#\d+L?\]", plan)
    assert len(sizes_refs) >= 2, plan

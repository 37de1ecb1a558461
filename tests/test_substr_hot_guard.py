"""Hot-window-key guard for the ExactSubstr family (r12): a window
key shared by very many occurrences must not co-locate in one analytic
window task — keys above ``hot_cap`` route through a map-side-
combinable groupBy + broadcast join-back, and the verdict is
bit-identical for every hot_cap (the guard changes routing, never the
answer)."""

from pyspark.sql import Row, functions as F

PASSAGE = "november oscar papa quebec romeo"


def _snap(df):
    return {
        r["doc_id"]: (
            r["clean_text"],
            r["n_tokens"],
            r["n_removed"],
            r["n_spans"],
        )
        for r in df.collect()
    }


def test_skew_fixture_verdicts_identical(spark):
    """The VERDICT r11 fixture: ONE viral k-window shared by 1e5
    documents (each with a unique prefix/suffix so only the passage
    duplicates). Guarded and unguarded plans must return identical
    verdicts: doc 0 keeps the passage, every other doc loses exactly
    the 5 passage tokens."""
    from cayley_spark.functions.dedup import exact_substr_dedup

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("u"),
            F.col("id").cast("string"),
            F.lit(f" {PASSAGE} t"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    guarded = exact_substr_dedup(docs, k=5, min_count=2, hot_cap=1000)
    agg = guarded.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_removed").alias("rm"),
        F.sum("n_spans").alias("sp"),
        F.sum(F.when(F.col("n_removed") == 0, 1).otherwise(0)).alias(
            "untouched"
        ),
    ).head()
    assert agg["n"] == 100_000
    assert agg["rm"] == 5 * (100_000 - 1)
    assert agg["sp"] == 100_000 - 1
    assert agg["untouched"] == 1  # the (id,pos)-minimum keeper, doc 0
    # guarded == unguarded, row for row (exceptAll both directions)
    unguarded = exact_substr_dedup(docs, k=5, min_count=2, hot_cap=None)
    assert guarded.exceptAll(unguarded).isEmpty()
    assert unguarded.exceptAll(guarded).isEmpty()


def test_all_hot_routing_matches_unguarded(spark):
    """hot_cap=1 forces EVERY window down the groupBy+broadcast path
    (the sample pre-pass flags every key): the stress case for the
    hot branch's exactness, including sub-min_count candidates and
    within-doc repeats."""
    from cayley_spark.functions.dedup import exact_substr_dedup

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{PASSAGE} one two three {PASSAGE}"),
            Row(doc_id=2, text=f"echo {PASSAGE} foxtrot golf"),
            Row(doc_id=3, text="unrelated plain body text here"),
            Row(doc_id=4, text=f"{PASSAGE} tail"),
        ]
    )
    a = _snap(exact_substr_dedup(docs, k=5, min_count=2, hot_cap=1))
    b = _snap(exact_substr_dedup(docs, k=5, min_count=2, hot_cap=None))
    assert a == b
    assert a[3][2] == 0  # untouched doc stays whole under all-hot


def test_against_and_index_paths_honor_guard(spark, tmp_path):
    """exact_substr_against and SubstrDedupIndex.trim with hot_cap=1
    (all-hot) match their unguarded verdicts."""
    from cayley_spark.functions.dedup import exact_substr_against
    from cayley_spark.functions.dedup_index import SubstrDedupIndex

    ref = spark.createDataFrame(
        [Row(doc_id=100, text=f"corpus holds {PASSAGE} already")]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"first copy {PASSAGE} body"),
            Row(doc_id=2, text=f"second copy {PASSAGE} body"),
            Row(doc_id=3, text="golf hotel india juliet kilo lima mike"),
            Row(doc_id=4, text="golf hotel india juliet kilo lima mike"),
        ]
    )
    a = _snap(exact_substr_against(new, ref, k=5, min_count=2, hot_cap=1))
    b = _snap(exact_substr_against(new, ref, k=5, min_count=2, hot_cap=None))
    assert a == b
    # doc 1 loses only the corpus passage (it keeps the batch-shared
    # flank windows as keeper); doc 2 loses the merged 7-token span
    assert a[1][2] == 5 and a[2][2] == 7
    assert a[3][2] == 0 and a[4][2] > 0  # keep-one within batch

    idx = SubstrDedupIndex.build(ref, k=5).save(str(tmp_path / "idx"))
    ia = _snap(idx.trim(new, min_count=2, hot_cap=1))
    ib = _snap(idx.trim(new, min_count=2, hot_cap=None))
    assert ia == ib == a  # index path reproduces the exact-string verdict


def test_guard_plan_shape(spark):
    """Plan pin: the guarded plan keeps the analytic Window for cold
    keys, adds ONLY broadcast joins for the guard (the occurrence
    stream is never reshuffled for it), and still never pairs
    documents."""
    from cayley_spark.functions.dedup import exact_substr_dedup

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=f"{PASSAGE} one two three")]
    )
    plan = (
        exact_substr_dedup(docs, k=5, min_count=2, hot_cap=1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan  # the r11 single-shuffle rewrite survives
    assert "BroadcastExchange" in plan  # hot set broadcasts, never shuffles
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # guard adds at most four hash exchanges: the sampled candidate
    # count, the exact hot (cnt, keeper) aggregate over the routed
    # hot stream, and the hot-hits union branch's id shuffle into the
    # starts groupBy — never a join-back reshuffle of the occurrence
    # stream (all guard joins are BroadcastExchange)
    unguarded = (
        exact_substr_dedup(docs, k=5, min_count=2, hot_cap=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    extra = plan.count("Exchange hashpartitioning") - unguarded.count(
        "Exchange hashpartitioning"
    )
    assert extra <= 4, plan

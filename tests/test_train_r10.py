"""Round-10 operator tests: in-engine hashed-linear trainer,
CCNet-faithful external-model lm_perplexity, Gopher line-level rules.

Replica discipline: every fuzz compares the Spark plan against a
pure-python model of the same integer arithmetic (the LPA/perplexity
pattern from test_model_fuzz_r9.py)."""

import hashlib
import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

VOCAB = ["ga", "bo", "zu", "ki", "re", "ta"]
BUCKETS = 64


def _feats(text, buckets=BUCKETS):
    toks = re.findall(r"\w+", text.lower())
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {}
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets
        out[b] = out.get(b, 0) + 1
    return out


def _train_replica(docs, epochs, lr=1, buckets=BUCKETS):
    """Exact model of hashed_linear_train: batch perceptron, ties
    count as misclassified, integer arithmetic throughout."""
    w = {}
    fx = [(lbl, _feats(t, buckets)) for (lbl, t) in docs]
    for _ in range(epochs):
        grad = {}
        for lbl, f in fx:
            score = sum(c * w.get(b, 0) for b, c in f.items())
            if lbl * score <= 0:
                for b, c in f.items():
                    grad[b] = grad.get(b, 0) + lbl * c * lr
        for b, g in grad.items():
            w[b] = w.get(b, 0) + g
    return {b: v for b, v in w.items() if v != 0}


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from([1, -1]),
            st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8).map(
                " ".join
            ),
        ),
        min_size=1,
        max_size=8,
    ),
    epochs=st.integers(min_value=1, max_value=3),
)
def test_hashed_linear_train_matches_replica(spark, docs, epochs):
    from cayley_spark.functions.text import hashed_linear_train

    df = spark.createDataFrame(
        [(i, t, lbl) for i, (lbl, t) in enumerate(docs)],
        "doc_id long, text string, label int",
    )
    got = {
        r["bucket"]: r["weight"]
        for r in hashed_linear_train(
            df, buckets=BUCKETS, epochs=epochs
        ).collect()
    }
    assert got == _train_replica(docs, epochs)


def test_trainer_separates_and_scores(spark):
    """End-to-end loop: train on curated-vs-crawl labels, score with
    hashed_linear_score, and the classes separate on training data
    (linearly separable by construction — disjoint vocabularies)."""
    from cayley_spark.functions.text import (
        hashed_linear_score,
        hashed_linear_train,
    )

    good = ["good clean prose here"] * 4
    bad = ["zz qq xx vv junk"] * 4
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, -1) for i, t in enumerate(bad)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = hashed_linear_train(df, buckets=BUCKETS, epochs=3)
    scored = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_score(df, w, buckets=BUCKETS).collect()
    }
    assert all(scored[i] > 0 for i in range(4))
    assert all(scored[100 + i] < 0 for i in range(4))


def test_trainer_rejects_zero_epochs(spark):
    from cayley_spark.functions.text import hashed_linear_train

    df = spark.createDataFrame([(0, "x", 1)], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="epochs"):
        hashed_linear_train(df, epochs=0)


def _tri_model(texts, scale=1_000_000):
    docs = [re.findall(r"\w+", t.lower()) for t in texts]
    tris = {}
    for toks in docs:
        for i in range(len(toks) - 2):
            t = tuple(toks[i : i + 3])
            tris[t] = tris.get(t, 0) + 1
    bi = {}
    for t, c in tris.items():
        bi[t[:2]] = bi.get(t[:2], 0) + c
    V = len({w for toks in docs for w in toks})
    return {
        t: math.floor(-scale * math.log((c + 1) / (bi[t[:2]] + V)))
        for t, c in tris.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ref=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=3, max_size=10).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    ),
    target=st.lists(
        st.lists(
            st.sampled_from(VOCAB + ["oov"]), min_size=0, max_size=10
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
)
def test_lm_perplexity_external_model_matches_replica(spark, ref, target):
    """CCNet split: model trained on a clean reference corpus scores
    a different target corpus; OOV trigrams cost default_nll each."""
    from cayley_spark.functions.text import lm_perplexity, lm_train_trigram

    default_nll = 20_000_000
    rdf = spark.createDataFrame([(t,) for t in ref], "text string")
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target)], "doc_id long, text string"
    )
    model = lm_train_trigram(rdf)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["nll_scaled"])
        for r in lm_perplexity(
            tdf, model=model, default_nll=default_nll
        ).collect()
    }
    nll = _tri_model(ref)
    want = {}
    for d, t in enumerate(target):
        toks = re.findall(r"\w+", t.lower())
        ts = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        if ts:
            want[d] = (
                len(ts),
                sum(nll.get(x, default_nll) for x in ts),
            )
    assert got == want


def test_lm_perplexity_default_oov_penalty(spark):
    """default_nll=None derives max(model nll) + scale from the
    bounded model table."""
    from cayley_spark.functions.text import lm_perplexity, lm_train_trigram

    rdf = spark.createDataFrame([("ga bo zu ga bo zu",)], "text string")
    model = lm_train_trigram(rdf)
    mx = max(r["nll"] for r in model.collect())
    tdf = spark.createDataFrame(
        [(0, "oov oov oov")], "doc_id long, text string"
    )
    row = lm_perplexity(tdf, model=model).collect()[0]
    assert row["n_trigrams"] == 1
    assert row["nll_scaled"] == mx + 1_000_000


def test_lm_perplexity_broadcast_model_plan(spark):
    """broadcast_model=True: the model join against the corpus is a
    BroadcastHashJoin — the 100 TB CCNet path never shuffles the
    corpus onto trigram keys."""
    from cayley_spark.functions.text import lm_perplexity, lm_train_trigram

    rdf = spark.createDataFrame([("ga bo zu ki re ta",)], "text string")
    tdf = spark.createDataFrame(
        [(0, "ga bo zu ki")], "doc_id long, text string"
    )
    df = lm_perplexity(
        tdf,
        model=lm_train_trigram(rdf),
        default_nll=1,
        broadcast_model=True,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    at = plan.find("BroadcastHashJoin")
    assert at != -1
    # the scoring path (root down to the model join) never sort-merges
    # the corpus; a model-sized SMJ inside the TRAINING subtree is fine
    # (CCNet trains once offline, scores forever)
    assert "SortMergeJoin" not in plan[:at]


def test_c4_rules_boundaries(spark):
    """Raffel et al. 2020 §2.2 battery: line retention (terminal
    punctuation + ≥5 words), sentence gate, lorem/brace drops,
    cleaned text reassembly."""
    from cayley_spark.functions.text import c4_rules

    docs = [
        # 0: two good lines + one short + one unpunctuated
        (0, "one two three four five.\nshort line.\nsix seven eight nine ten!\nno terminal punct here"),
        # 1: lorem ipsum page
        (1, "Lorem Ipsum dolor sit amet okay.\nmore words one two three."),
        # 2: curly brace page
        (2, "function f() { return 1; } one two three four five."),
        # 3: only two sentences
        (3, "one two three four five.\nsix seven eight nine ten."),
        # 4: quote-terminated line counts
        (4, 'he said "one two three four five."\nsix seven eight nine ten.\neleven twelve thirteen fourteen fifteen?'),
        # 5: NULL text
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in c4_rules(df).collect()}
    assert out[0]["n_kept_lines"] == 2 and out[0]["n_lines"] == 4
    assert out[0]["clean_text"] == (
        "one two three four five.\nsix seven eight nine ten!"
    )
    assert out[0]["n_sentences"] == 3 and out[0]["keep_c4"]
    assert out[1]["has_lorem"] and not out[1]["keep_c4"]
    assert out[2]["has_brace"] and not out[2]["keep_c4"]
    assert out[3]["n_sentences"] == 2 and not out[3]["ok_sentences"]
    assert out[4]["n_kept_lines"] == 3 and out[4]["keep_c4"]
    assert out[5]["n_kept_lines"] == 0 and not out[5]["keep_c4"]
    assert out[5]["clean_text"] == ""


def test_token_entropy_matches_replica(spark):
    """Integer-scaled Shannon entropy: exact python replica; uniform
    tokens score ln(n), repeated single token scores 0."""
    from cayley_spark.functions.text import token_entropy

    docs = [
        (0, "a b c d"),  # uniform: H = ln(4)
        (1, "a a a a"),  # degenerate: H = 0
        (2, "a a b"),  # mixed
        (3, ""),  # no tokens: no output row
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy_scaled"])
        for r in token_entropy(df).collect()
    }
    want = {}
    for d, t in docs:
        toks = re.findall(r"\w+", t.lower())
        if not toks:
            continue
        n = len(toks)
        cnt = {}
        for w in toks:
            cnt[w] = cnt.get(w, 0) + 1
        want[d] = (
            n,
            sum(
                c * math.floor(1_000_000 * math.log(n / c))
                for c in cnt.values()
            ),
        )
    assert got == want
    assert got[1][1] == 0
    assert got[0][1] == 4 * math.floor(1_000_000 * math.log(4))


def test_gopher_line_rules_boundaries(spark):
    """Rae et al. 2021 appendix A line rules at their thresholds:
    >90% bullet-start lines fails, =90% passes; >30% ellipsis-end
    lines fails, =30% passes; flat docs have n_lines=1."""
    from cayley_spark.functions.text import gopher_rules

    docs = [
        # 0: 10 lines, 9 bullets = exactly 90% -> ok
        (0, "\n".join(["- item"] * 9 + ["plain"])),
        # 1: 10 lines, all bullets -> fail
        (1, "\n".join(["* item"] * 10)),
        # 2: 10 lines, 3 ellipsis ends = exactly 30% -> ok
        (2, "\n".join(["trail..."] * 3 + ["plain"] * 7)),
        # 3: 10 lines, 4 ellipsis ends -> fail
        (3, "\n".join(["trail..."] * 4 + ["plain"] * 6)),
        # 4: unicode bullet + unicode ellipsis, leading whitespace
        (4, "  • dot\n  x…\ny\nz"),
        # 5: flat single line, no line structure
        (5, "plain flat text"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(df, min_words=1).collect()
    }
    assert out[0]["n_lines"] == 10 and out[0]["n_bullet_lines"] == 9
    assert out[0]["ok_bullet_lines"]
    assert not out[1]["ok_bullet_lines"] and not out[1]["pass_gopher"]
    assert out[2]["n_ellipsis_lines"] == 3 and out[2]["ok_ellipsis_lines"]
    assert not out[3]["ok_ellipsis_lines"]
    assert out[4]["n_bullet_lines"] == 1 and out[4]["n_ellipsis_lines"] == 1
    assert out[5]["n_lines"] == 1
    assert out[5]["ok_bullet_lines"] and out[5]["ok_ellipsis_lines"]

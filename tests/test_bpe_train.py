"""BPE merge learning (functions/text.bpe_train / bpe_segment).

Checked against an independent pure-python replica of the exact
contract: Sennrich get_stats pair counting (overlapping occurrences),
(count desc, pair lexicographic) argmax, greedy left-to-right
non-overlapping merge application. The 'abab' corpus pins the
double-separator regression (a single-separator encoding consumes the
joint and silently skips every second back-to-back occurrence)."""

import re

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.text import (
    BPE_PRETOKEN_RE,
    bpe_segment,
    bpe_train,
)

TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest widest",
    "widest widest abab abab abababab",
    "",
    None,
]


def _words(texts):
    freq = {}
    for t in texts:
        for w in re.findall(BPE_PRETOKEN_RE, t or ""):
            if w.strip() == "" or "\x1f" in w:
                continue
            freq[w] = freq.get(w, 0) + 1
    return freq


def _merge_word(s, a, b):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _py_train(texts, n_merges):
    freq = _words(texts)
    syms = {w: list(w) for w in freq}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for w, f in freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, cnt))
        syms = {w: _merge_word(s, a, b) for w, s in syms.items()}
    return merges


def _py_segment(text, merges):
    out = []
    for w in re.findall(BPE_PRETOKEN_RE, text or ""):
        if w.strip() == "" or "\x1f" in w:
            continue
        s = list(w)
        for _rank, a, b, _cnt in merges:
            s = _merge_word(s, a, b)
        out.extend(s)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bpe_train_matches_python_replica(spark, docs):
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, n_merges=8, checkpoint_every=3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _py_train(TEXTS, 8)
    assert len(got) == 8


def test_bpe_train_back_to_back_merges(spark):
    # 'abababab' must merge to [ab,ab,ab,ab] then [abab, abab]:
    # counting AND application both see back-to-back occurrences
    df = spark.createDataFrame(
        [(0, "abababab abababab")], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(df, n_merges=2).orderBy("merge_rank").collect()
    ]
    assert got == _py_train(["abababab abababab"], 2)
    # first merge is (a,b) — and its application must produce ab×4,
    # giving (ab,ab) as a candidate in round 2
    assert (got[0][1], got[0][2]) == ("a", "b")
    assert (got[1][1], got[1][2]) == ("ab", "ab")


def test_bpe_train_exhausts_and_validates(spark):
    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    # pretokens: 'x', ' y' -> one mergeable pair total (' '+'y')
    out = bpe_train(df, n_merges=10).collect()
    assert len(out) == 1  # stops when no pairs remain
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


def test_bpe_segment_matches_python_replica(spark, docs):
    merges = _py_train(TEXTS, 6)
    seg = bpe_segment(F.col("text"), [(a, b) for _r, a, b, _c in merges])
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.select("doc_id", seg.alias("toks")).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_segment(t, merges), f"doc {i}"
    with pytest.raises(ValueError):
        bpe_segment(F.col("text"), [("a", "b")] * 257)


from hypothesis import HealthCheck, given, settings, strategies as st

_FUZZ_VOCAB = ["ab", "aba", "bab", "low", "lower", "abab", "a", "x y"]


@st.composite
def _corpora(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    texts = []
    for _ in range(n):
        words = draw(
            st.lists(st.sampled_from(_FUZZ_VOCAB), min_size=0, max_size=10)
        )
        texts.append(" ".join(words))
    return texts


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpora(), n=st.sampled_from([3, 6]))
def test_bpe_train_fuzz_matches_model(spark, texts, n):
    """Random corpora heavy in overlapping/self-similar words (ab,
    aba, abab — the regime where greedy-merge edge cases live) must
    reproduce the pure-python trainer exactly, including early
    exhaustion."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(df, n_merges=n, checkpoint_every=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _py_train(texts, n), f"diverges on {texts!r} n={n}"

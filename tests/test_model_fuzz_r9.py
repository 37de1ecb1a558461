"""Model-based fuzz for the round-9 operators.

The oracle queries pin ONE corpus; these pin the ALGORITHMS: random
small inputs through ``label_propagation`` and ``lm_perplexity``
must match pure-python replicas of the full rules. Both operators
are integer-deterministic by design (numeric labels / floored scaled
log-probs), so equality is exact, not statistical.
"""

import math
import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F


def _lpa_model(edges, iters):
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    both = und | {(v, u) for u, v in und}
    if not both:
        return {}
    adj = {}
    for u, v in both:
        adj.setdefault(u, []).append(v)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for v in nbrs:
                lv = labels[v]
                cnt[lv] = cnt.get(lv, 0) + 1
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    return labels


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    ),
    iters=st.sampled_from([1, 2, 3]),
)
def test_label_propagation_matches_model(spark, edges, iters):
    from cayley_spark.graphs.algorithms import label_propagation

    want = _lpa_model(edges, iters)
    if not want:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["community"]
        for r in label_propagation(df, iters=iters).collect()
    }
    assert got == want


VOCAB = ["ga", "bo", "zu", "ki", "re", "ta"]


def _perplexity_model(texts):
    docs = {i: re.findall(r"\w+", t.lower()) for i, t in enumerate(texts)}
    tris, want = {}, {}
    for toks in docs.values():
        for i in range(len(toks) - 2):
            t = tuple(toks[i : i + 3])
            tris[t] = tris.get(t, 0) + 1
    if not tris:
        return {}
    bi = {}
    for t, c in tris.items():
        bi[t[:2]] = bi.get(t[:2], 0) + c
    V = len({w for toks in docs.values() for w in toks})
    nll = {
        t: math.floor(-1e6 * math.log((c + 1) / (bi[t[:2]] + V)))
        for t, c in tris.items()
    }
    for d, toks in docs.items():
        ts = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        if ts:
            want[d] = (len(ts), sum(nll[t] for t in ts))
    return want


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    )
)
def test_lm_perplexity_matches_model(spark, texts):
    from cayley_spark.functions.text import lm_perplexity

    want = _perplexity_model(texts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["nll_scaled"])
        for r in lm_perplexity(df).collect()
    }
    assert got == want

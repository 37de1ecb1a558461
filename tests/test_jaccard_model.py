"""Model-based fuzz for exact n-gram Jaccard pairs
(functions/dedup.ngram_jaccard_pairs).

Both physical plans — the direct postings self-join and the
AllPairs prefix-filtered path (with the round-8 in-join length
filter) — are EXACT algorithms, so each must match a brute-force
pure-python all-pairs model exactly on random corpora with planted
near-duplicates. Forcing `direct_join_budget` to 1e18 / 0 exercises
each path deterministically regardless of the measured sum(df²);
this pins that the length bound (t·na <= nb <= na/t) never prunes a
true pair and that prefix selection loses no candidate."""

import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa",
]

K = 2


def _shingles(text):
    toks = re.findall(r"\w+", text.lower())
    if len(toks) < K:
        return set()
    return {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}


def _model_pairs(rows, threshold):
    sh = {
        (i, blk): _shingles(t) for i, t, blk in rows if _shingles(t)
    }
    out = {}
    keys = sorted(sh)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            (ia, ba), (ib, bb) = keys[x], keys[y]
            if ba != bb:
                continue
            a, b = sh[keys[x]], sh[keys[y]]
            inter = len(a & b)
            jac = inter / (len(a) + len(b) - inter)
            if jac >= threshold:
                lo, hi = min(ia, ib), max(ia, ib)
                out[(lo, hi)] = round(jac, 9)
    return out


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=4, max_value=9))
    rows = []
    for i in range(n):
        blk = draw(st.sampled_from(["en", "de"]))
        if rows and draw(st.integers(0, 2)) == 0:
            base = draw(st.sampled_from(rows))
            toks = base[1].split()
            blk = base[2]  # near-dup stays in its block
            if toks and draw(st.booleans()):
                pos = draw(st.integers(0, len(toks) - 1))
                toks = list(toks)
                toks[pos] = draw(st.sampled_from(VOCAB))
            rows.append((i, " ".join(toks), blk))
        else:
            toks = draw(
                st.lists(st.sampled_from(VOCAB), min_size=0, max_size=16)
            )
            rows.append((i, " ".join(toks), blk))
    return rows


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=corpora(),
    thresh=st.sampled_from([0.28, 0.3, 0.6]),
    budget=st.sampled_from([10**18, 0]),  # direct / forced AllPairs
)
def test_ngram_jaccard_both_plans_match_model(spark, rows, thresh, budget):
    from cayley_spark.functions.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string, blk string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(
            df, "blk", k=K, threshold=thresh, direct_join_budget=budget
        ).collect()
    }
    want = _model_pairs(rows, thresh)
    assert got == want, f"{'allpairs' if budget == 0 else 'direct'} diverges"


def test_length_filter_float_boundary_regression(spark):
    """double(0.28) rounds UP, so a tight nb*t <= na bound kills the
    true boundary pair J = 7/25 = 0.28 that verification accepts —
    the AllPairs and direct 'exact' plans then disagree (review
    finding, round 8). The slacked bound must keep both plans equal."""
    from cayley_spark.functions.dedup import ngram_jaccard_pairs

    w = [f"w{i}" for i in range(26)]
    rows = [
        (1, " ".join(w[:8]), "en"),   # 7 shingles, all inside doc 2's
        (2, " ".join(w), "en"),       # 25 shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, blk string")
    for budget in (10**18, 0):
        got = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(
                df, "blk", k=K, threshold=0.28, direct_join_budget=budget
            ).collect()
        }
        assert got == {(1, 2): round(7 / 25, 9)}, budget

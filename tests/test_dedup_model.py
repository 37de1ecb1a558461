"""Model-based fuzz for the MinHash-LSH dedup pipeline.

The oracle queries pin ONE corpus; this pins the ALGORITHM: random
small corpora (with planted duplicates and near-duplicates) run
through ``minhash_lsh_pairs`` must match a pure-python replica of
the full rule — \\w+ tokenize → k-shingle → 16 md5-minima → 4-band
hashes → bucket join (hot buckets skipped) → exact shingle-Jaccard
verification. The md5-as-permutation trick makes both sides fully
deterministic, so equality is exact, not statistical.
"""

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lam", "mu",
]

K, H, B, ROWS = 3, 16, 4, 4


def _shingles(text):
    toks = re.findall(r"\w+", text.lower())
    out = []
    for i in range(len(toks) - K + 1):
        s = " ".join(toks[i : i + K])
        if s not in out:
            out.append(s)
    return out


def _model_pairs(rows, threshold, cap):
    sh, sigs = {}, {}
    for i, t in rows:
        s = _shingles(t)
        if s:
            sh[i] = set(s)
            sigs[i] = [
                min(
                    hashlib.md5(f"{j}:{x}".encode()).hexdigest()
                    for x in s
                )
                for j in range(H)
            ]
    buckets = {}
    for i, sg in sigs.items():
        for b in range(B):
            bh = hashlib.md5(
                "|".join(sg[b * ROWS : (b + 1) * ROWS]).encode()
            ).hexdigest()
            buckets.setdefault((b, bh), []).append(i)
    cand = set()
    for ids in buckets.values():
        if cap is not None and len(ids) > cap:
            continue
        cand.update(
            (x, y) for x in ids for y in ids if x < y
        )
    out = {}
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        if jac >= threshold:
            out[(a, b)] = round(jac, 9)
    return out


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=4, max_value=9))
    rows = []
    for i in range(n):
        if rows and draw(st.integers(0, 3)) == 0:
            # planted duplicate / near-duplicate of an earlier doc
            base = draw(st.sampled_from(rows))[1].split()
            if base and draw(st.booleans()):
                pos = draw(st.integers(0, len(base) - 1))
                base = list(base)
                base[pos] = draw(st.sampled_from(VOCAB))
            rows.append((i, " ".join(base)))
        else:
            toks = draw(
                st.lists(
                    st.sampled_from(VOCAB), min_size=1, max_size=24
                )
            )
            rows.append((i, " ".join(toks)))
    return rows


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpora(), thresh=st.sampled_from([0.2, 0.5, 0.8]))
def test_minhash_pipeline_matches_model(spark, rows, thresh):
    from cayley_spark.functions.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_pairs(
            df, jaccard_threshold=thresh
        ).collect()
    }
    want = _model_pairs(rows, thresh, cap=256)
    assert got == want, f"diverges on {rows!r} @ {thresh}"


def test_minhash_model_hot_bucket_cap(spark):
    """The cap-aware model also pins the guard: 12 identical docs
    with cap=8 → model drops the bucket, Spark drops the bucket."""
    from cayley_spark.functions.dedup import minhash_lsh_pairs

    rows = [(i, "alpha beta gamma delta epsilon") for i in range(12)]
    rows += [(50, "zeta eta theta iota kappa"), (51, "zeta eta theta iota kappa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, jaccard_threshold=0.5, max_bucket_size=8
        ).collect()
    }
    assert got == set(_model_pairs(rows, 0.5, cap=8))
    assert got == {(50, 51)}

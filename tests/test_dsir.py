"""DSIR importance resampling (functions/sampling.dsir_weights /
dsir_sample — Xie et al., NeurIPS 2023).

The integer model-count sums are checked against an independent
pure-python replica (the oracle's job at driver time); the float
log-weight is checked for the semantic that matters: documents whose
n-gram profile matches the target corpus outscore documents that
don't, and the Gumbel resample is deterministic."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.sampling import (
    dsir_sample,
    dsir_weights,
    hashed_ngram_buckets,
)

B = 64  # tiny bucket count so collisions actually occur in the test


def _py_buckets(text, buckets=B):
    toks = re.findall(r"\w+", text.lower(), re.ASCII)
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets
        for g in grams
    ]


RAW = [
    (0, "alpha beta alpha beta gamma", "tgt"),
    (1, "alpha beta alpha", "tgt"),
    (2, "delta epsilon zeta delta", "other"),
    (3, "eta theta iota kappa", "other"),
    (4, "alpha beta gamma delta", "mixed"),
    (5, "", "other"),
    (6, None, "other"),
]


def _frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string, src string")
    target = raw.where(F.col("src") == "tgt")
    return raw, target


def test_hashed_buckets_match_python_replica(spark):
    raw, _ = _frames(spark)
    got = {
        r["doc_id"]: r["b"]
        for r in raw.select(
            "doc_id", hashed_ngram_buckets(F.col("text"), B).alias("b")
        ).collect()
    }
    for doc_id, text, _src in RAW:
        assert got[doc_id] == _py_buckets(text or ""), doc_id


def test_integer_sums_match_python_replica(spark):
    raw, target = _frames(spark)
    out = {
        r["doc_id"]: r
        for r in dsir_weights(raw, target, buckets=B).collect()
    }
    tgt_counts, raw_counts = {}, {}
    for doc_id, text, src in RAW:
        for b in _py_buckets(text or ""):
            raw_counts[b] = raw_counts.get(b, 0) + 1
            if src == "tgt":
                tgt_counts[b] = tgt_counts.get(b, 0) + 1
    for doc_id, text, _src in RAW:
        bs = _py_buckets(text or "")
        if not bs:
            assert doc_id not in out  # no grams -> drops out
            continue
        row = out[doc_id]
        assert row["n_grams"] == len(bs)
        assert row["target_freq_sum"] == sum(tgt_counts.get(b, 0) for b in bs)
        assert row["raw_freq_sum"] == sum(raw_counts[b] for b in bs)


def test_logw_matches_python_replica_and_prefers_target(spark):
    raw, target = _frames(spark)
    out = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, target, buckets=B, alpha=1.0).collect()
    }
    tgt_counts, raw_counts = {}, {}
    for doc_id, text, src in RAW:
        for b in _py_buckets(text or ""):
            raw_counts[b] = raw_counts.get(b, 0) + 1
            if src == "tgt":
                tgt_counts[b] = tgt_counts.get(b, 0) + 1
    T, R = sum(tgt_counts.values()), sum(raw_counts.values())
    for doc_id, text, _src in RAW:
        bs = _py_buckets(text or "")
        if not bs:
            continue
        expect = sum(
            math.log((tgt_counts.get(b, 0) + 1.0) / (raw_counts[b] + 1.0))
            for b in bs
        ) + len(bs) * math.log((R + B) / (T + B))
        assert out[doc_id] == pytest.approx(expect, rel=1e-9), doc_id
    # the semantic: target-vocab docs outscore disjoint-vocab docs
    # (per-gram average, so length differences don't mask it)
    n = {r_id: len(_py_buckets(t or "")) for r_id, t, _ in RAW}
    assert out[0] / n[0] > out[3] / n[3]
    assert out[1] / n[1] > out[2] / n[2]


def test_dsir_sample_deterministic_topk(spark):
    raw, target = _frames(spark)
    a = [
        r["doc_id"]
        for r in dsir_sample(raw, target, k=3, buckets=B).collect()
    ]
    b = [
        r["doc_id"]
        for r in dsir_sample(raw, target, k=3, buckets=B).collect()
    ]
    assert a == b and len(a) == 3 and len(set(a)) == 3
    # different seed may reorder, but stays deterministic per seed
    c = [
        r["doc_id"]
        for r in dsir_sample(raw, target, k=3, buckets=B, seed="s2").collect()
    ]
    assert len(c) == 3
    with pytest.raises(ValueError):
        dsir_sample(raw, target, k=0, buckets=B)


def test_dsir_plan_models_broadcast_no_pairing(spark):
    # both model joins must broadcast (models bounded by `buckets`)
    # and nothing may pair documents with each other
    raw, target = _frames(spark)
    plan = (
        dsir_weights(raw, target, buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_dsir_empty_target_is_finite(spark):
    # an empty target is mathematically fine under smoothing: every
    # logw must be finite and computed with T=0, never NULL-poisoned
    raw, _ = _frames(spark)
    empty_target = raw.where(F.col("src") == "nope")
    out = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, empty_target, buckets=B).collect()
    }
    assert out, "no rows returned"
    raw_counts = {}
    for _id, text, _src in RAW:
        for b in _py_buckets(text or ""):
            raw_counts[b] = raw_counts.get(b, 0) + 1
    R = sum(raw_counts.values())
    for doc_id, text, _src in RAW:
        bs = _py_buckets(text or "")
        if not bs:
            continue
        expect = sum(
            math.log(1.0 / (raw_counts[b] + 1.0)) for b in bs
        ) + len(bs) * math.log((R + B) / B)
        assert out[doc_id] == pytest.approx(expect, rel=1e-9)
    # and sampling on it stays deterministic, not NULL-ordered
    picked = [
        r["doc_id"]
        for r in dsir_sample(raw, empty_target, k=2, buckets=B).collect()
    ]
    assert len(picked) == 2


def test_weighted_sample_matches_replica_and_guards(spark):
    import hashlib as _hashlib

    from cayley_spark.functions.sampling import weighted_sample

    rows = [
        (1, 100.0), (2, 1.0), (3, 50.0), (4, 0.0), (5, None),
        (6, -2.0), (7, 10.0), (8, 5.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, wt double")
    got = [
        r["doc_id"]
        for r in weighted_sample(df, "wt", k=3, seed="t").collect()
    ]
    # python replica of the exact keys (same md5 -> u -> gumbel path)
    def key(i, w):
        h = int(
            _hashlib.md5(f"t:{i}".encode()).hexdigest()[:15], 16
        )
        u = min((h + 1) / float(1 << 60), 1.0 - 2.0**-53)
        return math.log(w) + -math.log(-math.log(u))

    want = sorted(
        [(i, w) for i, w in rows if w and w > 0],
        key=lambda t: (-key(*t), t[0]),
    )[:3]
    assert got == [i for i, _w in want]
    # zero/NULL/negative weights never sampled, determinism holds
    assert not {4, 5, 6} & set(got)
    assert got == [
        r["doc_id"]
        for r in weighted_sample(df, "wt", k=3, seed="t").collect()
    ]
    with pytest.raises(ValueError):
        weighted_sample(df, "wt", k=0)

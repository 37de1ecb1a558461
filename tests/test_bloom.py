"""Bloom-filter membership (functions/bloom.py).

The load-bearing property is the PATH EQUIVALENCE: the packed
bit-array broadcast probe and the relational position-set probe (the
form the DuckDB oracle replays) must agree on every key, including
false positives. Plus the bloom invariants: zero false negatives
always; false positives appear when the array saturates and are
deterministic.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.bloom import (
    bloom_build,
    bloom_positions,
    bloom_probe,
    bloom_probe_keys,
)


def _docs(spark, n=60):
    rows = [(i, f"text-{i}", "en" if i % 3 == 0 else "de") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _py_positions(key: str, n_bits: int, k: int):
    """Independent pure-python replica of the seeded-md5 positions."""
    return [
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16) % n_bits
        for i in range(k)
    ]


def test_positions_match_python_replica(spark):
    df = spark.range(1).select(F.lit("hello world").alias("s"))
    got = df.select(
        F.array(*bloom_positions(F.col("s"), 1 << 12, 4)).alias("p")
    ).head()["p"]
    assert got == _py_positions("hello world", 1 << 12, 4)


def test_no_false_negatives_and_path_equivalence(spark):
    docs = _docs(spark)
    key = F.col("text")
    members = docs.where(F.col("lang") == "en")
    built = bloom_build(members, key, n_bits=1 << 10, k=3)
    out = {
        r["doc_id"]: r["maybe_member"]
        for r in bloom_probe(docs, built, key, n_bits=1 << 10, k=3)
        .select("doc_id", "maybe_member")
        .collect()
    }
    # bloom invariant: every build-side key reports member
    for r in members.collect():
        assert out[r["doc_id"]] is True
    # oracle-form replica agrees bit-for-bit (false positives included)
    rel = {
        r["doc_id"]: r["maybe_member"]
        for r in bloom_probe_keys(
            docs, members, key, key, "doc_id", n_bits=1 << 10, k=3
        ).collect()
    }
    assert out == rel


def test_false_positives_on_saturated_array(spark):
    # 60 keys x 2 hashes into 64 bits saturates the array: non-members
    # must start reporting true, and exactly per the position-set rule.
    docs = _docs(spark)
    key = F.col("text")
    members = docs.where(F.col("lang") == "en")
    built = bloom_build(members, key, n_bits=64, k=2)
    set_bits = set()
    for r in members.collect():
        set_bits.update(_py_positions(r["text"], 64, 2))
    out = {
        r["doc_id"]: r["maybe_member"]
        for r in bloom_probe(docs, built, key, n_bits=64, k=2)
        .select("doc_id", "maybe_member")
        .collect()
    }
    fps = 0
    for r in docs.collect():
        expect = all(p in set_bits for p in _py_positions(r["text"], 64, 2))
        assert out[r["doc_id"]] == expect
        if expect and r["lang"] != "en":
            fps += 1
    assert fps > 0  # the regime the test exists for


def test_null_key_has_defined_membership(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    built = bloom_build(
        df.where(F.col("doc_id") == 2), F.col("text"), n_bits=256, k=2
    )
    out = bloom_probe(df, built, F.col("text"), n_bits=256, k=2)
    got = {r["doc_id"]: r["maybe_member"] for r in out.collect()}
    # NULL hashes as '' (hash_bucket convention) -> same key as doc 2
    assert got == {1: True, 2: True}


def test_parameter_validation(spark):
    df = _docs(spark, n=4)
    with pytest.raises(ValueError):
        bloom_build(df, F.col("text"), n_bits=100, k=2)  # not mult of 64
    with pytest.raises(ValueError):
        bloom_build(df, F.col("text"), n_bits=1 << 10, k=0)
    with pytest.raises(ValueError):
        built = bloom_build(df, F.col("text"), n_bits=1 << 10, k=2)
        bloom_probe(df, built, F.col("text"), n_bits=1 << 30, k=2)


def test_probe_plan_is_broadcast_no_shuffle(spark):
    # The probe side must not shuffle: the packed words arrive via a
    # 1-row broadcast and the membership tests are pure expressions.
    docs = _docs(spark)
    built = bloom_build(docs, F.col("text"), n_bits=1 << 10, k=3)
    plan = (
        bloom_probe(docs, built, F.col("text"), n_bits=1 << 10, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only Exchange allowed on the probe branch is the broadcast
    # of the packed words; the build side's own groupBy shuffle sits
    # beneath the broadcast and never moves probe rows
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_bloom_save_load_merge(spark, tmp_path):
    """Persistence roundtrip probes identically, and merging the
    bloom of corpus A with the bloom of corpus B equals the bloom
    built over A ∪ B in one pass (bit arrays compose) — the
    incremental-maintenance property."""
    from cayley_spark.functions.bloom import (
        bloom_load,
        bloom_merge,
        bloom_save,
    )

    docs = _docs(spark, 80)
    key = F.col("text")
    a = docs.where(F.col("doc_id") < 40)
    b = docs.where(F.col("doc_id") >= 40)
    ba = bloom_build(a, key, n_bits=1 << 10, k=3)
    bb = bloom_build(b, key, n_bits=1 << 10, k=3)

    path = str(tmp_path / "bloom_a")
    bloom_save(ba, path, n_bits=1 << 10, k=3)
    loaded, n_bits, k = bloom_load(spark, path)
    assert (n_bits, k) == (1 << 10, 3)  # geometry rides the artifact
    orig = {
        r["doc_id"]: r["maybe_member"]
        for r in bloom_probe(docs, ba, key, n_bits=1 << 10, k=3)
        .select("doc_id", "maybe_member")
        .collect()
    }
    rt = {
        r["doc_id"]: r["maybe_member"]
        for r in bloom_probe(docs, loaded, key, n_bits=1 << 10, k=3)
        .select("doc_id", "maybe_member")
        .collect()
    }
    assert rt == orig

    merged = {
        (r["word_idx"], r["bits"])
        for r in bloom_merge(ba, bb).collect()
    }
    union = {
        (r["word_idx"], r["bits"])
        for r in bloom_build(docs, key, n_bits=1 << 10, k=3).collect()
    }
    assert merged == union


def test_probe_geometry_mismatch_raises(spark):
    # a bloom built with LARGER n_bits than probed must fail loudly,
    # not silently report false negatives
    docs = _docs(spark, 20)
    built = bloom_build(docs, F.col("text"), n_bits=1 << 12, k=3)
    with pytest.raises(ValueError, match="geometry"):
        bloom_probe(
            docs, built, F.col("text"), n_bits=256, k=3
        ).collect()


def test_probe_keys_duplicate_ids_no_false_negative(spark):
    # two rows sharing an id, both member keys: 2k position rows all
    # match — must still report member (count==lit(k) would not)
    members = spark.createDataFrame(
        [(1, "m1"), (2, "m2")], "doc_id long, text string"
    )
    built_src = members
    probe = spark.createDataFrame(
        [(7, "m1"), (7, "m1"), (8, "m1"), (9, "nope")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["maybe_member"]
        for r in bloom_probe_keys(
            probe, built_src, F.col("text"), F.col("text"), "doc_id",
            n_bits=1 << 10, k=3,
        ).collect()
    }
    assert got == {7: True, 8: True, 9: False}


def test_geometry_carried_and_validated_both_directions(spark):
    """ADVICE r8: the old guard only caught build-n_bits > probe-n_bits
    (word_idx overflow); build-SMALLER-than-probe passed silently and
    false-negatived. The bloom now carries (n_bits, k) and probe/merge
    validate BOTH directions; unset parameters inherit the carried
    geometry, so the default-footgun (build at 2^17, probe with the
    2^20 default) is gone entirely."""
    from cayley_spark.functions.bloom import bloom_merge

    docs = _docs(spark, n=32)
    key = F.col("text")
    built = bloom_build(docs, key, n_bits=1 << 10, k=3)
    assert {"word_idx", "bits", "n_bits", "k"} == set(built.columns)

    # unset parameters: probe inherits the build geometry
    inherited = {
        r["text"]: r["maybe_member"]
        for r in bloom_probe(docs, built, key).collect()
    }
    assert all(inherited.values())  # members always maybe-member

    # probing with LARGER n_bits than the build now raises (used to
    # silently false-negative)
    with pytest.raises(ValueError, match="n_bits"):
        bloom_probe(docs, built, key, n_bits=1 << 12, k=3)
    # smaller also raises, and so does a k mismatch
    with pytest.raises(ValueError, match="n_bits"):
        bloom_probe(docs, built, key, n_bits=1 << 6, k=3)
    with pytest.raises(ValueError, match="k="):
        bloom_probe(docs, built, key, n_bits=1 << 10, k=2)
    # matching declaration still accepted
    ok = bloom_probe(docs, built, key, n_bits=1 << 10, k=3)
    assert {r["text"]: r["maybe_member"] for r in ok.collect()} == inherited

    # merge: mismatched geometries refuse to compose; matching ones
    # carry the geometry forward
    other = bloom_build(docs, key, n_bits=1 << 12, k=3)
    with pytest.raises(ValueError, match="geometry mismatch"):
        bloom_merge(built, other)
    merged = bloom_merge(built, bloom_build(docs, key, n_bits=1 << 10, k=3))
    assert {"word_idx", "bits", "n_bits", "k"} == set(merged.columns)
    assert bloom_probe(docs, merged, key).count() == 32

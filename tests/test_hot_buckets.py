"""Hot-bucket guard for the batch LSH band joins.

One boilerplate band hash shared by B documents (templated pages,
license headers) must not produce B² candidate rows from a single
skewed shuffle key. Every banded batch operator skips buckets with
more than ``max_bucket_size`` occupants — these tests seed one such
bucket with N identical-signature docs and assert candidate volume
is bounded (0 from the skipped bucket) while organic near-dup pairs
elsewhere are unaffected, and that byte-identical members of a
skipped bucket are still caught by the digest passes.
"""

import pytest
from pyspark.sql import functions as F

BOILER = (
    "permission is hereby granted free of charge to any person "
    "obtaining a copy of this software and associated documentation"
)
# pinned pair: md5-MinHash signatures are deterministic, and these
# two (J=0.83) collide in bands 0, 2, 3 — verified, not hoped-for
_BASE = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows past the old stone bridge near the quiet village where the "
    "baker sells warm bread every single morning to travelers"
)
NEAR_A = _BASE
NEAR_B = _BASE.replace("morning", "evening")
UNIQUE = "completely unrelated text about spark catalyst optimizer internals"


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 byte-identical boilerplate docs → one signature → 4 buckets
    # of occupancy 40 each; plus one organic near-dup pair; plus a
    # singleton.
    rows = [(i, BOILER) for i in range(40)]
    rows += [(100, NEAR_A), (101, NEAR_B), (200, UNIQUE)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_minhash_lsh_skips_hot_bucket(corpus):
    from cayley_spark.functions.dedup import minhash_lsh_pairs

    capped = _pairs(minhash_lsh_pairs(corpus, max_bucket_size=8))
    # the hot bucket's 40*39/2 = 780 pairs are gone; the organic pair
    # survives because its bucket has only 2 occupants
    assert (100, 101) in capped
    assert not any(a < 40 and b < 40 for a, b in capped)
    # uncapped control: the boilerplate pairs exist (the guard is what
    # removed them, not the fixture)
    uncapped = _pairs(minhash_lsh_pairs(corpus, max_bucket_size=None))
    assert sum(1 for a, b in uncapped if a < 40 and b < 40) == 780
    assert (100, 101) in uncapped


def test_candidate_volume_is_bounded(corpus):
    """The bound the guard exists for: candidate rows O(N·cap), not
    O(N²). With skip semantics a hot bucket contributes 0, so total
    candidates ≤ (#docs outside hot buckets)²-ish — here exactly 1."""
    from cayley_spark.functions.dedup import minhash_lsh_pairs

    n = minhash_lsh_pairs(corpus, max_bucket_size=8).count()
    assert n == 1  # only (100, 101); 780 boilerplate pairs skipped


def test_exact_pass_still_catches_skipped_boilerplate(corpus):
    """Byte-identical members of a skipped bucket are the EXACT
    operators' job — the documented division of labor."""
    from cayley_spark.functions.dedup import exact_duplicate_groups

    groups = exact_duplicate_groups(corpus).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 40


def test_neardup_batch_skips_hot_bucket(corpus):
    from cayley_spark.streaming.neardup import neardup_pairs_batch

    docs = corpus.withColumn("ts", F.to_timestamp(F.lit("2024-01-01")))
    capped = neardup_pairs_batch(docs, max_bucket_size=8)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert not any(a < 40 and b < 40 for a, b in got)
    assert (100, 101) in got
    uncapped = neardup_pairs_batch(docs, max_bucket_size=None)
    assert uncapped.where("id_a < 40 AND id_b < 40").count() > 0


def test_dedup_against_hot_bucket_falls_to_exact_pass(spark):
    """A new batch whose docs share a boilerplate bucket with the
    existing corpus: the LSH path skips the bucket, but byte-identical
    re-deliveries are still dropped by the digest semi-join; a
    NEAR-duplicate (not identical) boilerplate doc survives — the
    documented recall trade-off."""
    from cayley_spark.functions.dedup import dedup_against

    existing = spark.createDataFrame(
        [(i, BOILER) for i in range(30)] + [(90, NEAR_A)],
        "doc_id long, text string",
    )
    near_boiler = BOILER.replace("free of charge", "at no cost")
    new = spark.createDataFrame(
        [(1000, BOILER), (1001, near_boiler), (1002, NEAR_B), (1003, UNIQUE)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id
        for r in dedup_against(
            new, existing, jaccard_threshold=0.3, max_bucket_size=8
        ).collect()
    }
    assert 1000 not in out  # byte-identical: exact digest pass
    assert 1002 not in out  # organic near-dup of existing id 90
    assert 1003 in out  # unrelated survives
    # 1001 near-dups the skipped boilerplate bucket → survives (recall
    # trade-off); with the guard off it is dropped
    assert 1001 in out
    out_nocap = {
        r.doc_id
        for r in dedup_against(
            new, existing, jaccard_threshold=0.3, max_bucket_size=None
        ).collect()
    }
    assert 1001 not in out_nocap


def test_index_dedup_hot_bucket(spark, tmp_path):
    from cayley_spark.functions.dedup_index import LSHDedupIndex

    existing = spark.createDataFrame(
        [(i, BOILER) for i in range(30)] + [(90, NEAR_A)],
        "doc_id long, text string",
    )
    idx = LSHDedupIndex.build(existing).save(str(tmp_path / "idx"))
    new = spark.createDataFrame(
        [(1000, BOILER), (1002, NEAR_B), (1003, UNIQUE)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id
        for r in idx.dedup(
            new, jaccard_threshold=0.3, max_bucket_size=8
        ).collect()
    }
    assert out == {1003}  # 1000 via digest, 1002 via (cold) LSH


def test_index_rejects_mismatched_id_type(spark, tmp_path):
    from cayley_spark.functions.dedup_index import LSHDedupIndex

    existing = spark.createDataFrame(
        [(1, NEAR_A)], "doc_id long, text string"
    )
    idx = LSHDedupIndex.build(existing).save(str(tmp_path / "idx2"))
    bad = spark.createDataFrame(
        [("x", NEAR_B)], "doc_id string, text string"
    )
    with pytest.raises(TypeError, match="stores bigint"):
        idx.append(bad)
    with pytest.raises(TypeError, match="stores bigint"):
        idx.duplicate_ids(bad)

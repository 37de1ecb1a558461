"""Bloom-filter membership for cross-corpus dedup at scale.

The standard "have we already got this document?" primitive of a
training-data pipeline (Bloom 1970; surveyed in Broder & Mitzenmacher
2004; used for cross-corpus/benchmark membership in RefinedWeb,
Penedo et al. 2023): build a bit array once over the reference
corpus's keys, broadcast it, probe the raw crawl at scan speed with
zero shuffles on the probe side.  The reference engine
(cayleygraph/cayley) has no bloom operator — this extends the
LLM-data-pipeline surface alongside `dedup_against` (which is exact
but joins the corpora; the bloom trades a bounded false-positive rate
for a probe that never shuffles the 100-TB side).

Everything is deterministic and engine-portable: the k hash functions
are ``md5(i || ':' || key)`` truncated to 60 bits mod ``n_bits`` — the
same seeded-md5 family the MinHash/shard operators use — so a SQL
oracle can replay membership EXACTLY via the position-set equivalence
(a key is maybe-member iff all k of its bit positions appear in the
set of positions the build side set; the packed bit array is just an
O(1) representation of that set).

100-TB plan: the build side is one explode(k) + groupBy(word_idx)
bit_or — map-side combinable, output bounded by n_bits/64 rows no
matter the corpus size.  The probe side crossJoin-broadcasts the
packed words as ONE row (the repo's 1-row broadcast-scalar idiom) and
evaluates pure column expressions per probe row: no shuffle, no UDF,
whole-stage codegen end to end.  A 2^30-bit bloom is 128 MB — normal
executor-broadcast territory; the driver materializes n_bits/64 longs
once (bounded by the ``n_bits`` the caller chose, and validated).
For callers that cannot broadcast, ``bloom_probe_keys`` is the
join-form fallback: explode probe positions and semi-join the build
side's distinct positions — k·|probe| rows through one shuffle, the
relational form the oracle itself uses.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bloom_positions",
    "bloom_build",
    "bloom_probe",
    "bloom_probe_keys",
    "bloom_save",
    "bloom_load",
    "bloom_merge",
]

# Hard cap on the packed-array size the broadcast path will build:
# 2^27 bits = 16 MB on this single-JVM test rig.  Real clusters raise
# it (a 2^30-bit / 128 MB bloom is routine executor broadcast).
MAX_BROADCAST_BITS = 1 << 27


def _check(n_bits: int, k: int) -> None:
    if n_bits < 64 or n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")


def bloom_positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """The k bit positions of ``key``: seeded-md5 family, 60 hash bits
    each, mod n_bits.  NULL keys hash as '' (same convention as
    hash_bucket) so they get a defined membership instead of NULL."""
    _check(n_bits, k)
    s = F.coalesce(key.cast("string"), F.lit(""))
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 15), 16, 10
            ).cast("long"),
            F.lit(n_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key: Column, n_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Distributed bloom build → (word_idx BIGINT, bits BIGINT), only
    the non-zero 64-bit words.  One explode + one map-side-combinable
    groupBy; the result is bounded by n_bits/64 rows regardless of
    corpus size, so it stays tiny even when the build corpus is not."""
    pos = df.select(
        F.explode(F.array(*bloom_positions(key, n_bits, k))).alias("pos")
    )
    return (
        pos.select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key: Column,
    n_bits: int = 1 << 20,
    k: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe ``df`` against a built bloom, preserving every input row
    and appending ``out_col`` (true = maybe member, with the bloom's
    false-positive rate; false = DEFINITELY absent — no false
    negatives).  Broadcast path: the sparse words are packed into one
    dense array row, crossJoin-broadcast, and each probe row evaluates
    k element_at + shift tests as pure JVM expressions — the probe
    side never shuffles."""
    _check(n_bits, k)
    n_words = n_bits // 64
    if n_bits > MAX_BROADCAST_BITS:
        raise ValueError(
            f"n_bits={n_bits} exceeds the broadcast cap "
            f"{MAX_BROADCAST_BITS}; use bloom_probe_keys (join form)"
        )
    dense = [0] * n_words
    for row in bloom.collect():  # bounded: <= n_bits/64 rows by construction
        w = int(row["word_idx"])
        if w >= n_words:
            raise ValueError(
                f"bloom word_idx {w} >= n_bits/64={n_words}: the bloom "
                f"was built with a larger n_bits than this probe — "
                f"geometry mismatch would yield silent false negatives "
                f"(use the (n_bits, k) returned by bloom_load)"
            )
        dense[w] = int(row["bits"])
    spark = df.sparkSession
    packed = spark.createDataFrame(
        [(dense,)], schema="__bloom_bits array<bigint>"
    )
    pos_cols = bloom_positions(key, n_bits, k)
    probed = df.crossJoin(F.broadcast(packed))
    for i, p in enumerate(pos_cols):
        probed = probed.withColumn(f"__pos{i}", p)
    hit = None
    for i in range(k):
        t = F.expr(
            f"(shiftright(element_at(__bloom_bits, "
            f"CAST(shiftright(__pos{i}, 6) AS INT) + 1), "
            f"CAST(__pos{i} % 64 AS INT)) & 1) = 1"
        )
        hit = t if hit is None else hit & t
    return probed.withColumn(out_col, hit).drop(
        "__bloom_bits", *[f"__pos{i}" for i in range(k)]
    )


def bloom_probe_keys(
    df: DataFrame,
    build_df: DataFrame,
    probe_key: Column,
    build_key: Column,
    id_col: str,
    n_bits: int = 1 << 20,
    k: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Join-form probe → (id_col, out_col), one row per distinct id.
    Explodes each probe key's k positions and left-joins the build
    side's DISTINCT positions — the relational statement of exactly
    the bit-array test (a bit is set iff some build key hashed to it),
    so this path and bloom_probe agree bit-for-bit.  Use when the
    bloom exceeds broadcast budget: cost is k·|probe| rows through
    one shuffle keyed on uniformly-hashed positions (no skew)."""
    _check(n_bits, k)
    built = (
        build_df.select(
            F.explode(F.array(*bloom_positions(build_key, n_bits, k))).alias(
                "pos"
            )
        )
        .distinct()
        .withColumn("__set", F.lit(1))
    )
    probe = df.select(
        F.col(id_col),
        F.explode(F.array(*bloom_positions(probe_key, n_bits, k))).alias(
            "pos"
        ),
    )
    return (
        probe.join(built, "pos", "left")
        .groupBy(id_col)
        # count(1) (total position rows), not lit(k): duplicate ids
        # contribute k rows EACH, and lit(k) would report a true
        # member false. Duplicate ids with DIFFERENT keys AND their
        # memberships together (documented; bloom_probe keeps rows
        # separate — dedupe ids first if you need per-row verdicts).
        .agg((F.count("__set") == F.count(F.lit(1))).alias(out_col))
    )


def bloom_save(bloom: DataFrame, path: str, n_bits: int, k: int) -> None:
    """Persist the sparse (word_idx, bits) words as Parquet — the
    build-once artifact a 100-TB corpus produces in one batch job and
    every later ingest/probe job loads in milliseconds (≤ n_bits/64
    rows). The (n_bits, k) GEOMETRY rides along as a 1-row sidecar
    table: a probe with mismatched geometry computes different
    positions and silently reports false negatives — the one failure
    mode a bloom must never have — and the cross-job save/load
    workflow is exactly where constructor-time agreement gets lost.
    Written through Spark's writer so any Hadoop FS works."""
    _check(n_bits, k)
    spark = bloom.sparkSession
    bloom.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "words")
    )
    spark.createDataFrame(
        [(int(n_bits), int(k))], "n_bits long, k int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta")
    )


def bloom_load(spark, path: str) -> tuple[DataFrame, int, int]:
    """Load a bloom persisted by bloom_save → (words, n_bits, k).
    Returning the geometry WITH the words forces the caller to probe
    with the build-time parameters instead of re-guessing defaults."""
    meta = spark.read.parquet(os.path.join(path, "meta")).head()
    words = spark.read.parquet(os.path.join(path, "words"))
    return words, int(meta["n_bits"]), int(meta["k"])


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two blooms built with the SAME (n_bits, k): bit arrays
    compose, so the merged filter answers membership over the union
    of both build corpora exactly as if built in one pass — the
    incremental-maintenance property (yesterday's corpus bloom +
    today's delta bloom = today's corpus bloom, no re-read of the
    base). One tiny groupBy over ≤ 2·n_bits/64 rows.

    The caller owns the (n_bits, k) agreement — mixing geometries
    produces garbage, same as any bloom implementation."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )

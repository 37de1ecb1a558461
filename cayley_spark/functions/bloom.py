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


def _attach_geometry(words: DataFrame, n_bits: int, k: int) -> DataFrame:
    """Ride the (n_bits, k) geometry along as constant columns — the
    bloom's own positions are meaningless without them, and a probe
    with the wrong modulus yields silent FALSE NEGATIVES (the one
    failure mode a bloom must never have). Carrying them with the
    DataFrame lets probe/merge validate instead of trusting
    constructor-time agreement across jobs."""
    return words.select(
        "word_idx",
        "bits",
        F.lit(int(n_bits)).cast("long").alias("n_bits"),
        F.lit(int(k)).cast("int").alias("k"),
    )


def _carried_geometry(bloom: DataFrame) -> tuple[int, int] | None:
    """(n_bits, k) carried by the bloom, or None for geometry-less
    DataFrames (pre-geometry saves, hand-built words). Costs one tiny
    job: the distinct of two constant columns over a <= n_bits/64-row
    table. Raises if the frame carries CONFLICTING geometries (e.g. a
    unionByName of mismatched blooms)."""
    if "n_bits" not in bloom.columns or "k" not in bloom.columns:
        return None
    geoms = bloom.select("n_bits", "k").distinct().collect()
    if len(geoms) > 1:
        raise ValueError(
            f"bloom carries conflicting geometries {sorted((int(g[0]), int(g[1])) for g in geoms)}: "
            f"mixing blooms built with different (n_bits, k) produces "
            f"garbage membership"
        )
    if not geoms:  # empty build corpus: geometry folded away with the rows
        return None
    return int(geoms[0]["n_bits"]), int(geoms[0]["k"])


def _resolve_geometry(
    bloom: DataFrame, n_bits: int | None, k: int | None, where: str
) -> tuple[int, int]:
    """Reconcile caller-declared geometry with what the bloom carries:
    carried wins when the caller passes nothing; an explicit mismatch
    raises BOTH directions (larger-build/smaller-probe AND
    smaller-build/larger-probe — the latter used to pass silently and
    false-negative)."""
    carried = _carried_geometry(bloom)
    if carried is not None:
        cn, ck = carried
        if n_bits is not None and int(n_bits) != cn:
            raise ValueError(
                f"{where} geometry mismatch: declared n_bits={n_bits} != "
                f"build n_bits={cn} — positions would be computed mod the "
                f"wrong modulus (silent false negatives)"
            )
        if k is not None and int(k) != ck:
            raise ValueError(
                f"{where} geometry mismatch: declared k={k} != build k={ck}"
            )
        return cn, ck
    # geometry-less bloom: fall back to declared / module defaults
    return (
        int(n_bits) if n_bits is not None else 1 << 20,
        int(k) if k is not None else 4,
    )


def bloom_build(
    df: DataFrame, key: Column, n_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Distributed bloom build → (word_idx BIGINT, bits BIGINT,
    n_bits BIGINT, k INT) — only the non-zero 64-bit words, with the
    build geometry riding along as constant columns (validated by
    probe/merge; see _attach_geometry). One explode + one
    map-side-combinable groupBy; the result is bounded by n_bits/64
    rows regardless of corpus size, so it stays tiny even when the
    build corpus is not."""
    pos = df.select(
        F.explode(F.array(*bloom_positions(key, n_bits, k))).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return _attach_geometry(words, n_bits, k)


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key: Column,
    n_bits: int | None = None,
    k: int | None = None,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe ``df`` against a built bloom, preserving every input row
    and appending ``out_col`` (true = maybe member, with the bloom's
    false-positive rate; false = DEFINITELY absent — no false
    negatives).  Broadcast path: the sparse words are packed into one
    dense array row, crossJoin-broadcast, and each probe row evaluates
    k element_at + shift tests as pure JVM expressions — the probe
    side never shuffles.

    Geometry: a bloom built by bloom_build/bloom_load carries its
    (n_bits, k); leave the parameters unset and the probe uses the
    carried values, or declare them and a mismatch raises in BOTH
    directions (probing a 2^17-bit bloom with the 2^20 default used
    to pass silently and return false negatives). Geometry-less
    blooms (pre-geometry saves) keep the caller-declared values and
    the one-directional word_idx check."""
    if n_bits is not None and int(n_bits) > MAX_BROADCAST_BITS:
        # raise BEFORE collecting a beyond-budget word set
        raise ValueError(
            f"n_bits={n_bits} exceeds the broadcast cap "
            f"{MAX_BROADCAST_BITS}; use bloom_probe_keys (join form)"
        )
    if "n_bits" in bloom.columns:
        # geometry is carried: read it from ONE row and apply the
        # broadcast cap AND the declared-vs-carried check before
        # collecting — an over-cap filter used to be fully collected
        # (up to n_bits/64 rows, a driver-OOM risk) and only then
        # rejected, including when the caller declared an in-cap
        # n_bits against an over-cap carried geometry
        head = bloom.select("n_bits").limit(1).collect()
        if head:
            cb = int(head[0]["n_bits"])
            if cb > MAX_BROADCAST_BITS:
                raise ValueError(
                    f"bloom carries n_bits={cb}, over "
                    f"the broadcast cap {MAX_BROADCAST_BITS}; use "
                    f"bloom_probe_keys (join form)"
                )
            if n_bits is not None and int(n_bits) != cb:
                raise ValueError(
                    f"bloom_probe geometry mismatch: declared "
                    f"n_bits={n_bits} != build n_bits={cb} — positions "
                    f"would be computed mod the wrong modulus (silent "
                    f"false negatives)"
                )
    rows = bloom.collect()  # bounded: <= n_bits/64 rows by construction
    carried: set[tuple[int, int]] = set()
    if rows and "n_bits" in rows[0].__fields__ and "k" in rows[0].__fields__:
        carried = {(int(r["n_bits"]), int(r["k"])) for r in rows}
        if len(carried) > 1:
            raise ValueError(
                f"bloom carries conflicting geometries {sorted(carried)}"
            )
    if carried:
        cn, ck = next(iter(carried))
        if n_bits is not None and int(n_bits) != cn:
            raise ValueError(
                f"bloom_probe geometry mismatch: declared n_bits={n_bits} "
                f"!= build n_bits={cn} — positions would be computed mod "
                f"the wrong modulus (silent false negatives)"
            )
        if k is not None and int(k) != ck:
            raise ValueError(
                f"bloom_probe geometry mismatch: declared k={k} != build k={ck}"
            )
        n_bits, k = cn, ck
    else:
        n_bits = int(n_bits) if n_bits is not None else 1 << 20
        k = int(k) if k is not None else 4
    _check(n_bits, k)
    n_words = n_bits // 64
    if n_bits > MAX_BROADCAST_BITS:
        raise ValueError(
            f"n_bits={n_bits} exceeds the broadcast cap "
            f"{MAX_BROADCAST_BITS}; use bloom_probe_keys (join form)"
        )
    dense = [0] * n_words
    for row in rows:
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


def bloom_save(
    bloom: DataFrame, path: str, n_bits: int | None = None, k: int | None = None
) -> None:
    """Persist the sparse (word_idx, bits) words as Parquet — the
    build-once artifact a 100-TB corpus produces in one batch job and
    every later ingest/probe job loads in milliseconds (≤ n_bits/64
    rows). The (n_bits, k) GEOMETRY rides along as a 1-row sidecar
    table: a probe with mismatched geometry computes different
    positions and silently reports false negatives — the one failure
    mode a bloom must never have — and the cross-job save/load
    workflow is exactly where constructor-time agreement gets lost.
    Geometry parameters are optional when the bloom carries its own
    (the bloom_build output does); declaring them cross-checks.
    Written through Spark's writer so any Hadoop FS works."""
    n_bits, k = _resolve_geometry(bloom, n_bits, k, "bloom_save")
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
    n_bits, k = int(meta["n_bits"]), int(meta["k"])
    if "n_bits" not in words.columns or "k" not in words.columns:
        # pre-geometry save: re-attach from the sidecar so probe/merge
        # validate downstream
        words = _attach_geometry(words, n_bits, k)
    return words, n_bits, k


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two blooms built with the SAME (n_bits, k): bit arrays
    compose, so the merged filter answers membership over the union
    of both build corpora exactly as if built in one pass — the
    incremental-maintenance property (yesterday's corpus bloom +
    today's delta bloom = today's corpus bloom, no re-read of the
    base). One tiny groupBy over ≤ 2·n_bits/64 rows.

    Blooms that carry their (n_bits, k) are VALIDATED here — a
    geometry mismatch raises instead of producing garbage membership;
    the merged bloom carries the common geometry forward. Only for
    geometry-less inputs (pre-geometry saves) does the caller own
    the agreement."""
    ga, gb = _carried_geometry(a), _carried_geometry(b)
    if ga is not None and gb is not None and ga != gb:
        raise ValueError(
            f"bloom_merge: geometry mismatch {ga} vs {gb} — bit arrays "
            f"with different (n_bits, k) do not compose"
        )
    geom = ga if ga is not None else gb
    cols = ["word_idx", "bits"]
    merged = (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    return _attach_geometry(merged, *geom) if geom is not None else merged

"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products via ``F.aggregate(F.zip_with(...))``: JVM-side, no
  Python. Cross join is broadcast (the query side is k rows).
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing so
  each query only scores candidates sharing a signature prefix.
  At 100 TB the bucket join replaces the full cross product; recall is
  tunable by n_planes/n_tables.

Hyperplanes are derived deterministically from xxhash64 so runs are
reproducible without a driver-side RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    Returns (query_id, neighbor_id, score) — score as double.
    The query side is broadcast; the corpus is scanned once."""
    from pyspark.sql.window import Window

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    queries = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q"),
    )
    scored = (
        corpus.join(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q"), F.col("v")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def _plane(dim: int, plane_idx: int, table_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from xxhash64
    of (table, plane, dim-index) — computed driver-side once (tiny)."""
    from ..hashing import hash_str

    return [
        (hash_str(f"{table_idx}:{plane_idx}:{d}") % 2001 - 1000) / 1000.0
        for d in range(dim)
    ]


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 8, table_idx: int = 0
) -> Column:
    """Sign-bit signature of ``vec`` against n deterministic planes,
    packed into a long."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = _plane(dim, p, table_idx)
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic mini-kmeans for IVF coarse quantization: seeds =
    first ``n_centroids`` vectors in id order, then ``iters`` Lloyd
    rounds. Assignment is one distributed pass per round (argmin over
    broadcast centroid literals); the re-centering aggregate is
    (cluster, dim) → avg, tiny. Centroids return to the driver —
    n_centroids × dim floats, by construction small."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = [
        list(r["v"])
        for r in base.orderBy("id").limit(n_centroids).collect()
    ]
    for _ in range(iters):
        assigned = base.withColumn("c", _nearest(F.col("v"), cents))
        # Means via exact DECIMAL sums, not F.avg: decimal addition is
        # order-independent, so the centroids are bit-identical across
        # runs/partitionings AND reproducible by the SQL oracle (double
        # summation order varies with shuffle arrival order).
        stats = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()
        )
        new = {c: list(cent) for c, cent in enumerate(cents)}
        by_c: dict[int, dict[int, float]] = {}
        for r in stats:
            by_c.setdefault(r["c"], {})[r["pos"]] = r["m"]
        for c, dims in by_c.items():
            for pos, m in dims.items():
                new[c][pos] = m
        cents = [new[c] for c in range(len(cents))]
    return cents


def _nearest(v: Column, cents: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2) as one expression:
    array_min over (dist, idx) structs. Written as NESTED higher-order
    functions over a single 2-D literal array — the per-centroid
    unrolled form embedded 16 x dim literal constants and cost
    seconds of janino compilation PER LLOYD ROUND (each round's new
    centroid literals defeat the codegen cache), dominating kmeans on
    small inputs; HOF lambdas compile to one compact loop regardless
    of n_centroids x dim. The fold order over dimensions is identical
    to the unrolled form, so assignments (and the SQL oracle) are
    bit-for-bit unchanged. A chained when(d < best, ...) formulation
    is worse still: the running best duplicates into every next
    comparison and the tree grows 2^n_centroids (planner OOM at 16).
    Map-only by construction — no shuffle enters the assignment pass
    at any scale."""
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    entries = F.transform(
        cents_lit,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("i"),
        ),
    )
    return F.array_min(entries)["i"]


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors are bucketed by nearest centroid
    once; each query exactly scores only the ``nprobe`` closest
    buckets. At scale the bucketed table is the persisted index and a
    query touches ~nprobe/n_centroids of the corpus. Recall is tunable
    via nprobe (nprobe == n_centroids → exact brute force)."""
    import math

    from pyspark.sql.window import Window

    cents = kmeans_centroids(df, n_centroids, id_col=id_col, vec_col=vec_col)
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    bucketed = base.withColumn("c", _nearest(F.col("v"), cents))

    qvecs = {
        r["id"]: list(r["v"])
        for r in base.where(F.col("id").isin(query_ids)).collect()
    }

    def probes(qv: list[float]) -> list[int]:
        ds = [
            (sum((a - b) * (a - b) for a, b in zip(qv, c)), i)
            for i, c in enumerate(cents)
        ]
        return [i for _, i in sorted(ds)[:nprobe]]

    probe_rows = [
        (qid, c, qvecs[qid]) for qid in qvecs for c in probes(qvecs[qid])
    ]
    probe_df = df.sparkSession.createDataFrame(
        probe_rows, "query_id long, c int, q array<double>"
    )
    scored = (
        bucketed.join(F.broadcast(probe_df), "c")
        .where(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            cosine(F.col("q"), F.col("v")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, score) with
    id_a < id_b and cosine >= threshold.

    Default is the scale path: candidates must collide in >= 1 of
    ``n_tables`` hyperplane-signature tables (an equi-join on
    (table, signature) — uniform keys, no all-pairs), then candidates
    are verified with exact cosine. ``exact=True`` scores ALL pairs —
    the O(n²) correctness baseline for small corpora and the DuckDB
    oracle; at high thresholds the LSH path recovers the same pairs
    (near-duplicates collide in some band with high probability)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if exact:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        # Persist the signature table: it feeds BOTH sides of the
        # bucket self-join, and without the persist Catalyst's
        # project-collapse inlines the full signature pipeline
        # (n_tables x n_planes dot products against inline plane
        # literals) into each branch — the same recompute bug
        # minhash_lsh_pairs fixed (see dedup.py minhash_lsh_pairs).
        sigs = base.select(
            "id",
            "v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            hyperplane_signature(
                                F.col("v"), dim, n_planes, t
                            ).alias("sig"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("ts"),
        ).select(
            "id", "v", F.col("ts.t").alias("t"), F.col("ts.sig").alias("sig")
        ).persist()
        a = sigs.select("t", "sig", F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = sigs.select("t", "sig", F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = (
            a.join(b, ["t", "sig"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "va", "id_b", "vb")
            .dropDuplicates(["id_a", "id_b"])
        )
    out = (
        pairs.withColumn("score", cosine(F.col("va"), F.col("vb")))
        .where(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
    if not exact:
        from ._cache import track_persisted

        out = track_persisted(out, sigs)
    return out


SEMDEDUP_SIM_SCALE = 1_000_000_000


def semdedup(
    df: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "min_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): k-means
    cluster the embedding space, then WITHIN each cluster drop every
    vector with a near-twin (cosine >= threshold). Returns one row
    per vector — (id, cluster, kept, dup_of) — where a dropped
    vector's ``dup_of`` is its first-in-keep-order in-cluster twin.

    ``keep`` selects the single-survivor rule:

    - ``"min_id"`` (default): keep the lowest id among twins —
      deterministic and replayable by the SQL oracle with no float
      ordering.
    - ``"far_from_centroid"``: the paper-faithful rule (Abbas et al.
      2023 §3 keeps the point with LOWEST similarity to its cluster
      centroid — the least prototypical example, which measurably
      improves downstream data quality). Ordering is the integer-
      scaled centroid cosine ``floor(cos * 1e9)`` with id tiebreak,
      so the precedence relation is total and bit-deterministic
      across engines and summation orders (the fold over dimensions
      is the same sequential array-order sum the s_knn oracle
      replays).

    Scale shape — the clusters ARE the hot-bucket guard: the pair
    join is an equi-join on the cluster id, so candidate volume is
    sum(cluster_size²) instead of n². n_centroids scales with the
    corpus (the paper uses 50k clusters for LAION); the kmeans cost
    is iters map-only assignment passes plus a (cluster x dim)-sized
    aggregate, and the assignment pass reuses the one persisted
    (id, v, c, k) projection for both join sides so Catalyst reuses a
    single shuffle exchange. The centroid-similarity key is a
    map-only literal-array lookup riding the same pass — no extra
    shuffle for the paper rule."""
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(
            f"keep must be 'min_id' or 'far_from_centroid', got {keep!r}"
        )
    cents = kmeans_centroids(
        df, n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    assigned = base.withColumn("c", _nearest(F.col("v"), cents))
    if keep == "far_from_centroid":
        cents_lit = F.array(
            *[F.array(*[F.lit(x) for x in c]) for c in cents]
        )
        csim = cosine(
            F.col("v"), F.element_at(cents_lit, F.col("c") + 1)
        )
        key = F.floor(csim * F.lit(float(SEMDEDUP_SIM_SCALE))).cast("long")
    else:
        key = F.col("id")
    assigned = assigned.withColumn("k", key).persist()
    a = assigned.select(
        "c",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("k").alias("ka"),
    )
    b = assigned.select(
        "c",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("k").alias("kb"),
    )
    precedes = (F.col("ka") < F.col("kb")) | (
        (F.col("ka") == F.col("kb")) & (F.col("id_a") < F.col("id_b"))
    )
    dup = (
        a.join(b, "c")
        .where(precedes)
        .where(cosine(F.col("va"), F.col("vb")) >= threshold)
        .groupBy("id_b")
        .agg(
            F.min_by(
                "id_a", F.struct(F.col("ka"), F.col("id_a"))
            ).alias("dup_of")
        )
        .withColumnRenamed("id_b", "id")
    )
    out = assigned.join(dup, "id", "left").select(
        F.col("id").alias(id_col),
        F.col("c").alias("cluster"),
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
    )
    from ._cache import track_persisted

    return track_persisted(out, assigned)


def kcenter_sample(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point sampling —
    Sener & Savarese 2018, "Active Learning for CNNs: A Core-Set
    Approach"): seed with the minimum-id vector, then repeatedly add
    the point FARTHEST (squared L2) from the selected set. The
    diversity-selection counterpart of the dedup stack: dedup removes
    redundancy, the coreset picks a spread-out training subset.
    Returns the k selected rows as (id, rank) with rank = selection
    order (0 = seed). Deterministic: ties in the argmax break toward
    the smaller id, and the distance fold is the same sequential
    array-order sum the green s_knn_ivf oracle already replays.

    Scale shape: the selected set is k x dim floats — broadcast as
    literals into a map-only distance pass (the kmeans `_nearest`
    discipline), so each round is one scan + one top-1 reduction
    (orderBy().limit(1) = TakeOrdered, no global sort); k rounds
    total. The corpus never shuffles. Cost is k full scans — the
    standard greedy-coreset trade, bounded by keeping k modest per
    partition-of-interest (shard first for larger k)."""
    # id dtype follows the input schema (string-id corpora work);
    # the rank column is always int
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, rank int"
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist()
    try:
        seed_rows = base.orderBy("id").limit(1).collect()
        if not seed_rows:
            # empty corpus -> empty (typed) coreset, not IndexError
            return df.sparkSession.createDataFrame([], out_schema)
        seed = seed_rows[0]
        selected = [(seed["id"], list(seed["v"]))]
        for _ in range(k - 1):
            cents = [v for _, v in selected]
            cents_lit = F.array(
                *[F.array(*[F.lit(x) for x in c]) for c in cents]
            )
            d2 = F.array_min(
                F.transform(
                    cents_lit,
                    lambda c: F.aggregate(
                        F.zip_with(
                            F.col("v"), c, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                )
            )
            ids = [i for i, _ in selected]
            nxt = (
                base.where(~F.col("id").isin(ids))
                .select("id", "v", d2.alias("d2"))
                .orderBy(F.col("d2").desc(), F.col("id"))
                .limit(1)
                .collect()
            )
            if not nxt:
                break
            selected.append((nxt[0]["id"], list(nxt[0]["v"])))
        return df.sparkSession.createDataFrame(
            [(i, r) for r, (i, _) in enumerate(selected)],
            out_schema,
        )
    finally:
        base.unpersist()


def lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates that collide with the
    query in ≥1 of ``n_tables`` hyperplane-signature tables. The join
    is an equi-join on (table, signature) — uniform keys, no skew."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    sigs = base.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        hyperplane_signature(F.col("v"), dim, n_planes, t).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("ts"),
    ).select("id", "v", F.col("ts.t").alias("t"), F.col("ts.sig").alias("sig"))
    q = sigs.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("q"), "t", "sig"
    )
    cand = (
        sigs.join(F.broadcast(q), ["t", "sig"])
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "q", "v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("q"), F.col("v")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization: (id, qv array<int>, scale) with
    qv[i] = floor(v[i] / scale + 0.5), scale = max(|v|)/127 — an 8x
    storage/bandwidth cut for ANN serving (the standard int8 scheme).
    floor(x + 0.5) rather than round() on purpose: IEEE floor is
    identical in every engine, while round()'s half-way rule is not.
    All-zero vectors quantize to all-zero (scale set to 1 to avoid
    0/0). Pure column expressions, zero shuffle."""
    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(
        v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
        ).alias("qv"),
        scale.alias("scale"),
    )


def quantized_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k COSINE over int8-quantized vectors: rank by the
    integer dot product of quantized vectors over integer norms —
    cosine is scale-invariant, so the per-vector scales cancel and
    the score is a deterministic function of exact int64 sums (the
    only float ops are two correctly-rounded sqrts and one divide,
    identical in any IEEE engine — this is what makes the operator
    oracle-hashable, unlike float-accumulated cosine).

    Returns (query_id, neighbor_id, qscore). Recall vs full-precision
    cosine_topk degrades only via quantization error (~1/254 per
    component); the broadcast/cross-join shape matches cosine_topk.
    """
    from pyspark.sql.window import Window

    quant = quantize_embeddings(df, id_col=id_col, vec_col=vec_col)
    corpus = quant.select(
        F.col("id").alias("neighbor_id"), F.col("qv").alias("nv")
    )
    queries = quant.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("qv").alias("q")
    )
    idot = F.aggregate(
        F.zip_with("q", "nv", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inorm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.col(c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + (x * x).cast("long"),
        ).cast("double")
    )
    scored = (
        corpus.join(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        # zero vectors have no direction: excluded rather than NaN
        .where((inorm("q") > 0) & (inorm("nv") > 0))
        .select(
            "query_id",
            "neighbor_id",
            (idot / (inorm("q") * inorm("nv"))).alias("qscore"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "qscore")
    )

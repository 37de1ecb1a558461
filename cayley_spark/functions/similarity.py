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

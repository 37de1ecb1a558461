"""Deterministic corpus splitting/sampling.

A training-data pipeline needs splits that are (a) reproducible
across runs and engines, (b) content-addressed (a re-crawled copy of
a page lands in the same split, so held-out data stays held out even
across dedup changes), and (c) computable at scan speed. Hashing the
CONTENT and bucketing on the digest gives all three; this is the
standard held-out-split construction for web-scale corpora.

Everything here is a pure column expression over md5 hex — portable
to any engine (the DuckDB oracle reproduces the split byte-for-byte),
partition-local, zero shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(col: Column, buckets: int = 16) -> Column:
    """Deterministic bucket in [0, buckets): the first 8 hex chars of
    md5(content) as an int, mod buckets. 32 bits of hash is plenty for
    split assignment (collisions only shift bucket sizes, never
    reproducibility). NULL content hashes as the empty string — a
    NULL md5 would otherwise silently pin such rows to the
    ``otherwise`` branch of every split rule."""
    h = F.conv(
        F.substring(F.md5(F.coalesce(col, F.lit(""))), 1, 8), 16, 10
    ).cast("long")
    return (h % buckets).cast("int")


def hash_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    val_buckets: int = 1,
    test_buckets: int = 1,
    buckets: int = 16,
) -> DataFrame:
    """Assign every document to train/val/test by content hash:
    bucket < val_buckets -> 'val', next test_buckets -> 'test', rest
    'train'. Returns (id, bucket, split)."""
    b = hash_bucket(F.col(text_col), buckets)
    split = (
        F.when(b < val_buckets, F.lit("val"))
        .when(b < val_buckets + test_buckets, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.select(
        F.col(id_col), b.alias("bucket"), split.alias("split")
    )


def hash_sample(
    df: DataFrame, text_col: str = "text", rate_denominator: int = 16
) -> DataFrame:
    """Deterministic ~1/denominator content sample: keep rows whose
    hash bucket is 0. Same rows on every run and engine."""
    return df.where(hash_bucket(F.col(text_col), rate_denominator) == 0)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    order_col: str,
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` rows of
    each stratum with the smallest ``md5(order_col)`` — a content-
    addressed shuffle, so every engine and every run selects the same
    rows (``orderBy(rand())`` samples differently per run and per
    partitioning). One shuffle on the stratum key; per-stratum top-n
    via window row_number, which AQE keeps partial when strata are
    many."""
    from pyspark.sql.window import Window

    h = F.md5(F.col(order_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )

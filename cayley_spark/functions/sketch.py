"""Frequency sketches for unbounded key spaces.

Count-Min (Cormode & Muthukrishnan 2005): a d×w counter grid whose
size is FIXED regardless of key cardinality — the summary a 100-TB
pipeline ships around when the exact per-key groupBy output (∝
distinct keys: urls, shingles, n-grams) is itself too big to move.
Estimates only ever OVER-count: est(key) ≤ true(key) + εN with
probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.

The reference engine has no sketch operator — this extends the
LLM-data-pipeline surface (heavy-hitter detection over token/URL/
shingle streams feeding repetition filters and blocklists).

Hashing is the repo's portable seeded-md5 family, so a DuckDB oracle
replays every cell and every estimate EXACTLY (integer counts, no
engine-specific sketch encodings — unlike HLL/datasketches blobs).

100-TB plan: the build is one explode(d) + map-side-combinable
groupBy bounded by d·w output rows; no key list is ever collected.
Lookups broadcast the (tiny) grid and take a min over d pure-expr
probes; a full heavy-hitter scan joins the grid back to DISTINCT
keys — still grid-sized state, key-sized traffic, zero skew (cells
are uniformly hashed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["countmin_build", "countmin_estimate", "countmin_heavy_hitters"]


def _check(depth: int, width: int) -> None:
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")


def _cell(row: int, key: Column, width: int) -> Column:
    s = F.coalesce(key.cast("string"), F.lit(""))
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), s)), 1, 15), 16, 10
        ).cast("long"),
        F.lit(width),
    )


def countmin_build(
    df: DataFrame, key: Column, depth: int = 4, width: int = 1024
) -> DataFrame:
    """→ (row INT, bucket BIGINT, cnt BIGINT), only non-zero cells
    (≤ depth·width rows no matter the corpus). One explode + one
    map-side-combinable groupBy on uniform cell keys."""
    _check(depth, width)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell(r, key, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.groupBy("c.row", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    keys_df: DataFrame,
    cms: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est",
) -> DataFrame:
    """Append ``out_col`` = min over the d probed cells (0 when any
    probed cell is empty — an absent cell means no key hashed there).
    The grid is grid-sized, so the d probe joins broadcast; the
    keys side never shuffles."""
    _check(depth, width)
    out = keys_df
    for r in range(depth):
        cell_r = cms.where(F.col("row") == r).select(
            F.col("bucket").alias(f"__b{r}"),
            F.col("cnt").alias(f"__c{r}"),
        )
        out = out.withColumn(f"__b{r}", _cell(r, key, width)).join(
            F.broadcast(cell_r), f"__b{r}", "left"
        )
    est = F.least(
        *[F.coalesce(F.col(f"__c{r}"), F.lit(0)) for r in range(depth)]
    )
    drop = [f"__b{r}" for r in range(depth)] + [
        f"__c{r}" for r in range(depth)
    ]
    return out.withColumn(out_col, est.cast("long")).drop(*drop)


def countmin_heavy_hitters(
    df: DataFrame,
    key: Column,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, est) for every DISTINCT key whose CMS estimate reaches
    ``threshold`` — no false negatives (CMS never under-counts), false
    positives bounded by the grid's εN. The classic two-pass
    heavy-hitter scan when the exact groupBy output is too large:
    pass 1 builds the grid-sized sketch, pass 2 streams distinct keys
    past the broadcast grid."""
    cms = countmin_build(df, key, depth, width)
    keys = df.select(key.cast("string").alias("key")).distinct()
    est = countmin_estimate(
        keys, cms, F.col("key"), depth, width, out_col="est"
    )
    return est.where(F.col("est") >= F.lit(int(threshold)))

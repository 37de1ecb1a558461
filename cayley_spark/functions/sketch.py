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

import os

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "countmin_build",
    "countmin_estimate",
    "countmin_heavy_hitters",
    "countmin_save",
    "countmin_load",
]


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
    """→ (row INT, bucket BIGINT, cnt BIGINT, depth INT, width
    BIGINT), only non-zero cells (≤ depth·width rows no matter the
    corpus), with the grid GEOMETRY riding along as constant columns:
    an estimate probed with a different depth/width hashes to the
    wrong cells and silently returns under-counts — breaking the
    'never under-counts' contract — so countmin_estimate validates
    against these. One explode + one map-side-combinable groupBy on
    uniform cell keys."""
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
    grid = cells.groupBy("c.row", "c.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return grid.select(
        "row",
        "bucket",
        "cnt",
        F.lit(int(depth)).cast("int").alias("depth"),
        F.lit(int(width)).cast("long").alias("width"),
    )


def _carried_grid_geometry(cms: DataFrame) -> tuple[int, int] | None:
    """(depth, width) carried by the grid, or None for geometry-less
    grids (pre-geometry builds). Costs one job over the ≤ depth·width
    grid — trivial for a loaded (parquet-backed) sketch, one extra
    build-agg evaluation for an in-session one, which is why
    countmin_estimate only takes this path when the caller leaves the
    geometry unset."""
    if "depth" not in cms.columns or "width" not in cms.columns:
        return None
    geoms = cms.select("depth", "width").distinct().collect()
    if len(geoms) > 1:
        raise ValueError(
            f"count-min grid carries conflicting geometries "
            f"{sorted((int(g[0]), int(g[1])) for g in geoms)}"
        )
    if not geoms:
        return None
    return int(geoms[0]["depth"]), int(geoms[0]["width"])


def countmin_estimate(
    keys_df: DataFrame,
    cms: DataFrame,
    key: Column,
    depth: int | None = None,
    width: int | None = None,
    out_col: str = "est",
) -> DataFrame:
    """Append ``out_col`` = min over the d probed cells (0 when any
    probed cell is empty — an absent cell means no key hashed there).
    The grid is grid-sized, so the d probe joins broadcast; the
    keys side never shuffles.

    Geometry: leave depth/width unset and they are read from the
    grid's carried geometry columns (one trivial job for a loaded
    sketch). Declared values are validated IN-PLAN against the
    carried geometry of every matched cell via raise_error — zero
    extra jobs, and a mismatched probe (wrong modulus → silent
    under-counts, the failure mode the 'never under-counts' contract
    forbids) fails loudly on the first matched cell instead of
    returning wrong estimates. Geometry-less grids keep the
    caller-declared values unchecked (pre-geometry behavior)."""
    carried_cols = "depth" in cms.columns and "width" in cms.columns
    if depth is None or width is None:
        geom = _carried_grid_geometry(cms)
        if geom is None:
            depth = depth if depth is not None else 4
            width = width if width is not None else 1024
        else:
            if depth is not None and int(depth) != geom[0]:
                raise ValueError(
                    f"countmin_estimate geometry mismatch: declared "
                    f"depth={depth} != build depth={geom[0]}"
                )
            if width is not None and int(width) != geom[1]:
                raise ValueError(
                    f"countmin_estimate geometry mismatch: declared "
                    f"width={width} != build width={geom[1]}"
                )
            depth, width = geom
    depth, width = int(depth), int(width)
    _check(depth, width)
    out = keys_df
    for r in range(depth):
        sel = [
            F.col("bucket").alias(f"__b{r}"),
            F.col("cnt").alias(f"__c{r}"),
        ]
        if carried_cols:
            sel += [
                F.col("depth").alias(f"__d{r}"),
                F.col("width").alias(f"__w{r}"),
            ]
        cell_r = cms.where(F.col("row") == r).select(*sel)
        out = out.withColumn(f"__b{r}", _cell(r, key, width)).join(
            F.broadcast(cell_r), f"__b{r}", "left"
        )
    est = F.least(
        *[F.coalesce(F.col(f"__c{r}"), F.lit(0)) for r in range(depth)]
    ).cast("long")
    drop = [f"__b{r}" for r in range(depth)] + [
        f"__c{r}" for r in range(depth)
    ]
    if carried_cols:
        # in-plan guard: any matched cell whose carried geometry
        # disagrees with the probe's raises at execution time; the
        # raise_error lives INSIDE the output column so column
        # pruning cannot drop it
        ok = None
        for r in range(depth):
            c = (
                F.col(f"__d{r}").isNull()
                | (
                    (F.col(f"__d{r}") == F.lit(depth))
                    & (F.col(f"__w{r}") == F.lit(width))
                )
            )
            ok = c if ok is None else ok & c
        est = F.when(ok, est).otherwise(
            F.raise_error(
                F.lit(
                    f"countmin_estimate geometry mismatch: grid was "
                    f"built with a different (depth, width) than the "
                    f"declared ({depth}, {width}) — estimates would "
                    f"silently under-count"
                )
            ).cast("long")
        )
        drop += [f"__d{r}" for r in range(depth)] + [
            f"__w{r}" for r in range(depth)
        ]
    return out.withColumn(out_col, est).drop(*drop)


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


def countmin_save(cms: DataFrame, path: str) -> None:
    """Persist the grid as Parquet — the build-once artifact of the
    100-TB summary workflow (build in the nightly batch job, probe
    from every later job). The (depth, width) geometry columns ride
    along in the files, so a loaded sketch validates its probes the
    same way an in-session one does."""
    if "depth" not in cms.columns or "width" not in cms.columns:
        raise ValueError(
            "countmin_save: grid carries no geometry columns — save "
            "the output of countmin_build, not a hand-built grid"
        )
    cms.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "cells")
    )


def countmin_load(spark, path: str) -> tuple[DataFrame, int, int]:
    """Load a persisted sketch → (grid, depth, width). Returning the
    geometry WITH the grid forces the caller to probe with the
    build-time parameters instead of re-guessing defaults (probing
    with the wrong modulus silently under-counts)."""
    grid = spark.read.parquet(os.path.join(path, "cells"))
    geom = _carried_grid_geometry(grid)
    if geom is None:
        raise ValueError(
            f"countmin_load: {path} carries no geometry — not a "
            f"countmin_save artifact"
        )
    return grid, geom[0], geom[1]

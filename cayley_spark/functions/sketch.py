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
    "countmin_merge",
    "countmin_save",
    "countmin_load",
    "kmv_build",
    "kmv_merge",
    "kmv_estimate",
    "source_overlap",
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
    if depth is not None and width is not None and carried_cols:
        # Declared-geometry path: the in-plan raise_error guard below
        # only fires on cells a probe key actually MATCHES, so a
        # mismatched modulus whose mis-moduled probes all land on
        # absent cells would return est=0 silently — exactly the
        # under-count the guard exists to prevent, on the all-miss
        # path. One cheap grid-sized job closes that hole up front.
        geom = _carried_grid_geometry(cms)
        if geom is not None and (
            int(depth) != geom[0] or int(width) != geom[1]
        ):
            raise ValueError(
                f"countmin_estimate geometry mismatch: declared "
                f"({depth}, {width}) != build ({geom[0]}, {geom[1]}) "
                f"— probes would use the wrong modulus (silent "
                f"under-counts)"
            )
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


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise ADDITION of two grids built with the same (depth,
    width): Count-Min sketches compose linearly, so yesterday's
    corpus grid + today's delta grid ≡ a one-pass rebuild over the
    union — the same incremental-maintenance property bloom_merge
    gives the membership filter, with the same geometry validation
    (mismatched grids would silently mis-estimate). One tiny groupBy
    over ≤ 2·depth·width rows."""
    ga, gb = _carried_grid_geometry(a), _carried_grid_geometry(b)
    if ga is not None and gb is not None and ga != gb:
        raise ValueError(
            f"countmin_merge: geometry mismatch {ga} vs {gb} — grids "
            f"with different (depth, width) do not compose"
        )
    geom = ga if ga is not None else gb
    cols = ["row", "bucket", "cnt"]
    merged = (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    if geom is None:
        return merged
    return merged.select(
        "row",
        "bucket",
        "cnt",
        F.lit(geom[0]).cast("int").alias("depth"),
        F.lit(geom[1]).cast("long").alias("width"),
    )


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


# ---------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------


def kmv_build(df: DataFrame, key: Column, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.
    2002; Beyer et al. 2007 "On synopses for distinct-value
    estimation under multiset operations"): the k lexicographically
    smallest md5 digests of the key set → (rank INT, h STRING, k
    INT), rank ascending from 1. Distinct-count estimate =
    (k-1) / fraction(h_k) — see :func:`kmv_estimate`.

    This is the engine-portable alternative to HLL blobs
    (``approx_count_distinct`` ships an opaque datasketch encoding no
    other engine can read): the state is plain hex digests, mergeable
    by set-union (:func:`kmv_merge`), and a SQL oracle replays it
    EXACTLY (``SELECT DISTINCT md5(key) ORDER BY 1 LIMIT k``). Fixed
    lowercase-hex width makes string order = numeric order.

    100-TB plan: a per-partition Arrow kernel keeps only the running
    k smallest DISTINCT digests (O(k) state, vectorized
    numpy.unique per batch, no sort of the corpus, no shuffle); at
    most k rows per partition survive to the final tiny
    distinct + TakeOrdered merge. The corpus is read once and never
    moved — the whole point of sketching the distinct count instead
    of groupBy-counting it."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = df.select(
        F.md5(F.coalesce(key.cast("string"), F.lit(""))).alias("h")
    )

    def _partition_minima(batches):
        import numpy as np
        import pandas as pd

        best = None
        for pdf in batches:
            vals = pdf["h"].to_numpy()
            cand = (
                np.unique(vals)
                if best is None
                else np.unique(np.concatenate([best, vals]))
            )
            best = cand[:k]
        if best is not None and len(best):
            yield pd.DataFrame({"h": best})

    minima = hashed.mapInPandas(_partition_minima, "h string")
    from pyspark.sql.window import Window

    topk = minima.dropDuplicates(["h"]).orderBy("h").limit(k)
    # rank window runs on <= k rows (post-limit) — never a wide plan
    return topk.select(
        F.row_number()
        .over(Window.orderBy("h"))
        .cast("int")
        .alias("rank"),
        "h",
        F.lit(int(k)).cast("int").alias("k"),
    )


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    k_shingle: int = 3,
    sketch_k: int = 256,
) -> DataFrame:
    """Pairwise corpus-overlap report between sources — the "how much
    of source A duplicates source B" estimate a training-data team
    runs before fixing mixture rates (overlapping sources double-count
    under independent per-source temperature weights; cf. the
    dataset-overlap audits in Gao et al. 2020 "The Pile" §4 and
    Penedo et al. 2023 §4.3). One row per unordered source pair:

    (src_a, src_b, n_common, n_union, jaccard_est) where the estimate
    is the standard KMV set-operation form (Beyer et al. 2007 §5.2):
    per source, sketch the k smallest distinct md5 digests of its
    ``k_shingle``-word shingle space; for a pair, take the k smallest
    of the sketch union U and estimate J ≈ |U ∩ K_a ∩ K_b| / |U|.
    When a pair's combined shingle space has ≤ k distinct members the
    sketches are complete and the estimate is EXACT.

    Everything is deterministic (md5, no RNG), so a SQL oracle
    replays it bit-for-bit — the same portability contract as
    :func:`kmv_build`.

    100-TB plan: the shingle explosion is scan-side; one Arrow
    kernel keeps the running k minima PER SOURCE within each
    partition (O(sources × k) state, vectorized numpy.unique, no
    shuffle of the corpus and no per-source window over the full
    shingle stream — the hot-entity trap the round-13 audit bans);
    at most sources × k rows per partition survive to a per-source
    merge bounded by partitions × k, and the pairwise stage is a
    broadcast self-join over the sources-sized sketch table."""
    if sketch_k < 2:
        raise ValueError(f"sketch_k must be >= 2, got {sketch_k}")
    from .dedup import word_shingles

    sh = word_shingles(F.col(text_col), k_shingle)
    hashed = df.select(
        F.col(source_col).alias("src"), F.explode(sh).alias("g")
    ).select("src", F.md5("g").alias("h"))

    def _per_source_minima(batches):
        import numpy as np
        import pandas as pd

        best: dict = {}
        for pdf in batches:
            for src, grp in pdf.groupby("src")["h"]:
                vals = grp.to_numpy()
                cand = (
                    np.unique(vals)
                    if src not in best
                    else np.unique(np.concatenate([best[src], vals]))
                )
                best[src] = cand[:sketch_k]
        for src, hs in best.items():
            yield pd.DataFrame({"src": src, "h": hs})

    minima = hashed.mapInPandas(
        _per_source_minima, "src string, h string"
    )
    # per-source merge over <= partitions x k rows per source: the
    # k smallest of the partials' union, as a sorted array
    sk = (
        minima.groupBy("src")
        .agg(
            F.slice(
                F.array_sort(F.collect_set("h")), 1, sketch_k
            ).alias("ks")
        )
    )
    a = sk.select(
        F.col("src").alias("src_a"), F.col("ks").alias("ka")
    )
    b = sk.select(
        F.col("src").alias("src_b"), F.col("ks").alias("kb")
    )
    # sources are a dimension (the broadcast self-join is S^2 rows of
    # k-element arrays, never corpus-sized)
    pairs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat("ka", "kb"))),
        1,
        sketch_k,
    )
    common = F.size(
        F.array_intersect(F.array_intersect(u, F.col("ka")), F.col("kb"))
    )
    return pairs.select(
        "src_a",
        "src_b",
        common.alias("n_common"),
        F.size(u).alias("n_union"),
        (
            common.cast("double") / F.size(u).cast("double")
        ).alias("jaccard_est"),
    )


def kmv_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set-union of two KMV sketches built with the same k: the k
    smallest of the union of survivors — EXACTLY the sketch of the
    concatenated corpora (Beyer et al. 2007 §4 multiset-union
    property), so per-shard/per-day sketches roll up without
    re-reading anything. Geometry (k) is validated like
    bloom/countmin merges."""
    ka = [int(r[0]) for r in a.select("k").distinct().collect()]
    kb = [int(r[0]) for r in b.select("k").distinct().collect()]
    if len(set(ka)) > 1 or len(set(kb)) > 1:
        raise ValueError("kmv_merge: sketch carries conflicting k values")
    if ka and kb and ka[0] != kb[0]:
        raise ValueError(
            f"kmv_merge: geometry mismatch k={ka[0]} vs k={kb[0]}"
        )
    k = ka[0] if ka else (kb[0] if kb else 0)
    if k == 0:
        return a.limit(0)
    from pyspark.sql.window import Window

    u = (
        a.select("h")
        .unionByName(b.select("h"))
        .dropDuplicates(["h"])
        .orderBy("h")
        .limit(k)
    )
    return u.select(
        F.row_number()
        .over(Window.orderBy("h"))
        .cast("int")
        .alias("rank"),
        "h",
        F.lit(k).cast("int").alias("k"),
    )


def kmv_estimate(sketch: DataFrame) -> float:
    """Distinct-count point estimate from a KMV sketch: if the
    sketch holds fewer than k digests the count is EXACT (every
    distinct key is present); otherwise est = (k-1) / frac(h_k)
    where frac maps the k-th smallest 128-bit digest into (0, 1).
    Unbiased per Beyer et al. 2007 §3.1."""
    rows = sketch.orderBy("rank").collect()
    if not rows:
        return 0.0
    k = int(rows[0]["k"])
    if len(rows) < k:
        return float(len(rows))
    frac = int(rows[-1]["h"], 16) / float(1 << 128)
    return (k - 1) / frac


# ---------------- bottom-k sample sketch (quantiles) ----------------


def sample_sketch_build(
    df: DataFrame, key: Column, value: Column, k: int = 256
) -> DataFrame:
    """Bottom-k SAMPLE sketch — the quantile/distribution member of
    the sketch family (Count-Min = frequencies, KMV = distinct count,
    bloom = membership; this = the VALUE DISTRIBUTION over distinct
    keys). The k distinct keys with the lexicographically smallest
    ``md5(key)`` digests form a content-addressed uniform sample of
    the key population (md5 is uniform on keys, so "smallest k
    digests" = "uniform k-subset", the KMV argument); each carries
    its value, and any distributional statistic — quantiles, mean,
    histogram — is computed exactly over the sample.

    Output: (rank INT, h STRING, v DOUBLE, k INT), rank ascending by
    digest. Deterministic and partitioning-independent (the sample is
    a pure function of the key set), mergeable by
    :func:`sample_sketch_merge` (bottom-k of a union = bottom-k of
    the per-part bottom-k's — the same multiset-union property as
    KMV), and SQL-replayable EXACTLY
    (``SELECT md5(key), MIN(value) GROUP BY 1 ORDER BY 1 LIMIT k``)
    — unlike ``approx_percentile``'s opaque datasketch blob.

    Duplicate key rows: the caller's contract is key -> value
    functional dependency (sample over ENTITIES); if violated, the
    MINIMUM value per key wins — a deterministic, oracle-replayable
    tie rule, never "whichever row arrived first". NULL-valued rows
    are EXCLUDED before sampling (SQL analog: ``WHERE value IS NOT
    NULL``): a key with no measurable value cannot participate in a
    value distribution, and keeping it would make quantile rank
    arithmetic depend on engine NULL-ordering defaults (Spark sorts
    NULLS FIRST ascending, DuckDB NULLS LAST — a silent divergence).

    100-TB plan: a per-partition Arrow kernel keeps only the running
    k smallest (digest, value) pairs (O(k) state per partition, no
    corpus sort, no shuffle); at most k rows per partition reach the
    final tiny merge. One corpus scan, nothing else moves."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    hashed = df.select(
        F.md5(F.coalesce(key.cast("string"), F.lit(""))).alias("h"),
        value.cast("double").alias("v"),
    ).where(F.col("v").isNotNull())

    def _partition_minima(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            cand = pdf if best is None else pd.concat([best, pdf])
            cand = (
                cand.groupby("h", as_index=False)["v"].min()
                .sort_values("h")
            )
            best = cand.iloc[:k]
        if best is not None and len(best):
            yield best

    part = hashed.mapInPandas(_partition_minima, "h string, v double")
    # <= k rows per partition reach this merge; the groupBy re-applies
    # the min rule across partitions of the same key
    top = (
        part.groupBy("h")
        .agg(F.min("v").alias("v"))
        .orderBy("h")
        .limit(k)
    )
    return top.select(
        F.row_number().over(Window.orderBy("h")).cast("int").alias("rank"),
        "h",
        "v",
        F.lit(k).cast("int").alias("k"),
    )


def sample_sketch_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two bottom-k sample sketches built with the same k:
    the k smallest digests of the union of survivors — EXACTLY the
    sketch of the concatenated corpora, so per-shard/per-day samples
    roll up without re-reading anything. A key present in both sides
    keeps the minimum value (the build's own duplicate rule).
    Geometry (k) is validated like the KMV/bloom/countmin merges —
    with one documented carve-out: an EMPTY sketch carries no rows,
    so its k is unknowable from the data and it merges with any
    geometry (the merge is still exact: union with nothing). The k
    column is the sketch's only geometry record by design — the
    sketch stays a plain DataFrame that round-trips through any
    format without side metadata (ADVICE r14 adjudication)."""
    ka = [int(r[0]) for r in a.select("k").distinct().collect()]
    kb = [int(r[0]) for r in b.select("k").distinct().collect()]
    if len(set(ka)) > 1 or len(set(kb)) > 1:
        raise ValueError(
            "sample_sketch_merge: sketch carries conflicting k values"
        )
    if ka and kb and ka[0] != kb[0]:
        raise ValueError(
            f"sample_sketch_merge: geometry mismatch k={ka[0]} vs k={kb[0]}"
        )
    k = ka[0] if ka else (kb[0] if kb else 0)
    if k == 0:
        return a.limit(0)
    from pyspark.sql.window import Window

    u = (
        a.select("h", "v")
        .unionByName(b.select("h", "v"))
        .groupBy("h")
        .agg(F.min("v").alias("v"))
        .orderBy("h")
        .limit(k)
    )
    return u.select(
        F.row_number().over(Window.orderBy("h")).cast("int").alias("rank"),
        "h",
        "v",
        F.lit(k).cast("int").alias("k"),
    )


def sample_sketch_quantiles(
    sketch: DataFrame, qs: list[float]
) -> DataFrame:
    """Positional (type-1) quantiles of the sampled value
    distribution: for each q, the value at row ceil(q*n) of the
    sample ordered by (v, h) — n <= k rows, so every window here is
    bounded by the sketch size, never the corpus. Positional
    selection (the q_median convention) means NO interpolation
    arithmetic: when values are integers the result is an observed
    integer, and a SQL oracle replays the selection exactly. Returns
    (q DOUBLE, value DOUBLE) ordered by q. Estimation error vs the
    true population quantile is the usual sampling error
    (O(1/sqrt(k)) in rank space), not a property of the selection."""
    import math

    from pyspark.sql.window import Window

    bad = [q for q in qs if not (0 <= float(q) <= 1)]
    if bad:
        # ceil(q*n) > n matches no rank in the join below, so an
        # out-of-range q would silently DROP its output row instead
        # of failing (ADVICE r14) — validate up front
        raise ValueError(
            f"sample_sketch_quantiles: q must be in [0, 1], got {bad}"
        )
    n = sketch.count()
    if n == 0:
        raise ValueError("sample_sketch_quantiles: empty sketch")
    ranked = sketch.select("v", "h").withColumn(
        "__r", F.row_number().over(Window.orderBy("v", "h"))
    )
    targets = [
        (float(q), int(max(1, math.ceil(float(q) * n)))) for q in qs
    ]
    tdf = sketch.sparkSession.createDataFrame(targets, "q double, idx int")
    return (
        ranked.join(F.broadcast(tdf), F.col("__r") == F.col("idx"))
        .select("q", F.col("v").alias("value"))
        .orderBy("q")
    )

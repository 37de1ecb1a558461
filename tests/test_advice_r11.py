"""Regression tests for the round-11 ADVICE fixes.

1. Crash between _swap_dir's two renames leaves the accumulated
   sketch only in {sub}.old; the folds must RESTORE it before their
   first-batch existence probe instead of treating the replayed batch
   as batch #1 (permanent Count-Min under-count / bloom false
   negatives) — and _swap_dir's entry guard must not delete the only
   copy.
2. bloom_probe's carried-geometry pre-collect guard runs whenever the
   bloom carries n_bits — including when the caller DECLARED an
   in-cap n_bits against an over-cap carried geometry (previously
   that path fully collected up to n_bits/64 rows first).
3. gopher_rules counts the Unicode ellipsis … in the symbol-ratio
   rule the same way the ellipsis-line rule always did.
"""

import os

import pytest
from pyspark.sql import functions as F


def _hadoop_rename(spark, src: str, dst: str) -> None:
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(src).getFileSystem(sc._jsc.hadoopConfiguration())
    assert fs.rename(hp(src), hp(dst))


def test_countmin_fold_recovers_crash_window(spark, tmp_path):
    """Simulate a crash exactly between _swap_dir's two renames (the
    target is gone, .old holds the accumulated grid): the next batch
    must fold INTO the recovered grid, not replace it."""
    from cayley_spark.functions.sketch import countmin_build
    from cayley_spark.streaming.sketches import _countmin_fold

    path = str(tmp_path / "cm")
    fold = _countmin_fold(F.col("key"), path, 4, 64)
    b0 = spark.createDataFrame([("a",), ("a",), ("b",)], "key string")
    fold(b0, 0)
    # crash window: target set aside as .old, replacement never landed
    _hadoop_rename(
        spark, os.path.join(path, "cells"), os.path.join(path, "cells.old")
    )
    b1 = spark.createDataFrame([("b",), ("c",)], "key string")
    fold(b1, 1)
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(os.path.join(path, "cells")).collect()
    }
    both = b0.unionAll(b1)
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_build(both, F.col("key"), 4, 64).collect()
    }
    assert got == want  # b0's counts survived the crash window
    assert not os.path.exists(os.path.join(path, "cells.old"))


def test_kmv_fold_recovers_crash_window(spark, tmp_path):
    from cayley_spark.streaming.sketches import _kmv_fold

    path = str(tmp_path / "kmv")
    fold = _kmv_fold(F.col("key"), path, k=256)
    fold(spark.createDataFrame([("a",), ("b",)], "key string"), 0)
    n0 = spark.read.parquet(os.path.join(path, "minima")).count()
    assert n0 == 2
    _hadoop_rename(
        spark, os.path.join(path, "minima"), os.path.join(path, "minima.old")
    )
    fold(spark.createDataFrame([("c",)], "key string"), 1)
    assert spark.read.parquet(os.path.join(path, "minima")).count() == 3


def test_swap_dir_entry_restores_orphaned_old(spark, tmp_path):
    """_swap_dir called when the target is absent but .old exists (a
    crashed prior swap) must treat .old as the previous state — never
    delete the only copy — and still complete the new swap."""
    from cayley_spark.functions.ann_index import _recover_swap, _swap_dir

    base = str(tmp_path / "swap")
    spark.createDataFrame([(9,)], "v int").write.parquet(f"{base}/d.old")
    spark.createDataFrame([(2,)], "v int").write.parquet(f"{base}/d.save.tmp")
    _swap_dir(spark, base, "d")
    assert spark.read.parquet(f"{base}/d").head()["v"] == 2
    assert not os.path.exists(f"{base}/d.old")
    # _recover_swap alone: restores when target absent, no-op otherwise
    _hadoop_rename(spark, f"{base}/d", f"{base}/d.old")
    _recover_swap(spark, base, "d")
    assert spark.read.parquet(f"{base}/d").head()["v"] == 2
    spark.createDataFrame([(7,)], "v int").write.parquet(f"{base}/stale.old")
    spark.createDataFrame([(3,)], "v int").write.parquet(f"{base}/stale")
    _recover_swap(spark, base, "stale")  # target exists: untouched
    assert spark.read.parquet(f"{base}/stale").head()["v"] == 3


def test_index_loads_recover_crash_window(spark, tmp_path):
    """All three persisted indexes auto-restore a crash-orphaned
    .old on load() instead of failing on the missing target (or,
    worse, having the next swap delete the only copy)."""
    from pyspark.sql import Row

    from cayley_spark.functions.dedup_index import (
        LSHDedupIndex,
        SubstrDedupIndex,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon zeta")]
    )

    def orphan(base, sub):
        _hadoop_rename(spark, f"{base}/{sub}", f"{base}/{sub}.old")

    p1 = str(tmp_path / "lsh")
    LSHDedupIndex.build(docs).save(p1)
    orphan(p1, "sigs")
    assert LSHDedupIndex.load(spark, p1).sigs.count() == 1

    p2 = str(tmp_path / "substr")
    SubstrDedupIndex.build(docs, k=3).save(p2)
    n = SubstrDedupIndex.load(spark, p2).wins.count()
    orphan(p2, "wins")
    assert SubstrDedupIndex.load(spark, p2).wins.count() == n

    from cayley_spark.functions.ann_index import IVFIndex
    from cayley_spark.functions.similarity import kmeans_centroids

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    p3 = str(tmp_path / "ivf")
    IVFIndex.build(emb, n_centroids=2, iters=1).save(p3)
    orphan(p3, "buckets")
    assert IVFIndex.load(spark, p3).bucketed.count() == 8


def test_bloom_probe_declared_incap_vs_carried_overcap(spark):
    """Declaring an in-cap n_bits against an over-cap carried geometry
    must raise from the 1-row head check, not after a full collect."""
    from cayley_spark.functions.bloom import MAX_BROADCAST_BITS, bloom_probe

    over = MAX_BROADCAST_BITS * 2
    fake = spark.createDataFrame(
        [(0, 1, over, 4)], "word_idx bigint, bits bigint, n_bits bigint, k int"
    )
    probe = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="broadcast cap"):
        bloom_probe(probe, fake, F.col("key"), n_bits=1 << 20)
    # in-cap carried vs different declared: the mismatch raises from
    # the same pre-collect head check
    incap = spark.createDataFrame(
        [(0, 1, 1 << 17, 4)],
        "word_idx bigint, bits bigint, n_bits bigint, k int",
    )
    with pytest.raises(ValueError, match="geometry mismatch"):
        bloom_probe(probe, incap, F.col("key"), n_bits=1 << 20)


def test_gopher_symbol_ratio_counts_unicode_ellipsis(spark):
    """'…' is a symbol in the symbol-ratio rule, matching the
    ellipsis-line rule's definition (ASCII ... or Unicode …)."""
    from cayley_spark.functions.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "plain words only here"),
            (2, "trailing thought… more words follow"),
            (3, "dots... and… both # kinds"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["n_symbols"]
        for r in gopher_rules(docs, min_words=1).collect()
    }
    assert got == {1: 0, 2: 1, 3: 3}

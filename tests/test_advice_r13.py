"""Round-13 review-fix regressions (the test_advice_r11/r12
pattern): crash-window holes in the persistence entry points that
lacked the _recover_swap / geometry-gate / staged-marker discipline
their siblings had, plus the save-consistency token that turns the
data-swapped-but-sidecar-stale crash window into a loud error."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.ann_index import IVFIndex
from cayley_spark.functions.dedup_index import (
    LSHDedupIndex,
    SubstrDedupIndex,
)


def _simulate_swap_crash(spark, path, sub):
    """Reproduce the _swap_dir crash window: the target dir exists
    only as {sub}.old (first rename done, second never ran)."""
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(path).getFileSystem(sc._jsc.hadoopConfiguration())
    assert fs.rename(
        hp(os.path.join(path, sub)), hp(os.path.join(path, f"{sub}.old"))
    )


def test_lsh_append_into_swap_window_recovers(spark, tmp_path):
    """Plain append during the crash window must restore sigs from
    sigs.old first — recreating sigs/ with only the batch would make
    every later dedup silently admit the whole historical corpus."""
    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lidx")
    idx = LSHDedupIndex.build(base, k=3).save(path)
    _simulate_swap_crash(spark, path, "sigs")
    batch = spark.createDataFrame(
        [(2, "one two three four five six")], "doc_id long, text string"
    )
    idx2 = LSHDedupIndex.load(spark, path)  # load recovers
    _simulate_swap_crash(spark, path, "sigs")  # crash again pre-append
    idx2.append(batch)
    ids = {r["id"] for r in idx2.sigs.select("id").collect()}
    assert ids == {1, 2}  # base row survived the window


def test_substr_append_into_swap_window_recovers(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    path = str(tmp_path / "sidx")
    idx = SubstrDedupIndex.build(base, k=5).save(path)
    n_base = idx.wins.count()
    assert n_base > 0
    _simulate_swap_crash(spark, path, "wins")
    batch = spark.createDataFrame(
        [(2, "m n o p q r s t u v w x")], "doc_id long, text string"
    )
    idx.append(batch)
    assert idx.wins.count() > n_base  # base + batch, not batch-only


def test_ivf_add_and_compact_into_swap_window_recover(spark, tmp_path):
    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    idx = IVFIndex.build(emb, n_centroids=2, vec_col="embedding",
                         id_col="vec_id")
    idx.save(path)
    _simulate_swap_crash(spark, path, "buckets")
    delta = spark.createDataFrame(
        [(100, [50.0, 1.0])], "vec_id long, embedding array<double>"
    )
    idx.add(delta, vec_col="embedding", id_col="vec_id", path=path)
    assert idx.bucketed.count() == 13  # 12 recovered + 1 delta
    _simulate_swap_crash(spark, path, "buckets")
    idx.compact(path)  # used to fail path-not-found in the window
    assert idx.bucketed.count() == 13
    # token survived both maintenance ops: load still accepts
    assert IVFIndex.load(spark, path).bucketed.count() == 13


def test_sketch_folds_reject_geometry_change(spark, tmp_path):
    """Restarting a sketch stream with different geometry must FAIL
    (the _substr_fold discipline), not silently corrupt: countmin
    would permanently under-count, bloom would produce false
    negatives, kmv would bias the estimate — and each fold re-stamps
    rows with the new geometry, erasing the evidence."""
    from pyspark.sql import Row

    from cayley_spark.streaming.sketches import (
        _bloom_fold,
        _countmin_fold,
        _kmv_fold,
    )

    df = spark.createDataFrame([Row(tok="a"), Row(tok="b")])
    cm = str(tmp_path / "cm")
    _countmin_fold(F.col("tok"), cm, 4, 1024)(df, 0)
    with pytest.raises(ValueError, match="geometry"):
        _countmin_fold(F.col("tok"), cm, 4, 2048)(df, 1)
    bl = str(tmp_path / "bl")
    _bloom_fold(F.col("tok"), bl, 1 << 17, 4)(df, 0)
    with pytest.raises(ValueError, match="geometry"):
        _bloom_fold(F.col("tok"), bl, 1 << 20, 4)(df, 1)
    kv = str(tmp_path / "kv")
    _kmv_fold(F.col("tok"), kv, 256)(df, 0)
    with pytest.raises(ValueError, match="k="):
        _kmv_fold(F.col("tok"), kv, 512)(df, 1)
    # same geometry still folds fine after the rejections
    _countmin_fold(F.col("tok"), cm, 4, 1024)(df, 1)
    _bloom_fold(F.col("tok"), bl, 1 << 17, 4)(df, 1)
    _kmv_fold(F.col("tok"), kv, 256)(df, 1)


def test_marker_staged_swap_recovers(spark, tmp_path):
    """The last_batch marker is staged-swapped: a crash between the
    renames (marker only in last_batch.old) must recover to the old
    value, not wedge every later batch with an unreadable dir."""
    from cayley_spark.streaming.sketches import (
        _read_last_batch,
        _write_last_batch,
    )

    path = str(tmp_path / "m")
    _write_last_batch(spark, path, 7)
    assert _read_last_batch(spark, path) == 7
    _write_last_batch(spark, path, 8)  # overwrite path works
    assert _read_last_batch(spark, path) == 8
    _simulate_swap_crash(spark, path, "last_batch")
    assert _read_last_batch(spark, path) == 8  # recovered, not -1


def test_stale_sidecar_after_crashed_save_is_loud(spark, tmp_path):
    """The save-consistency token: new data swapped in but the meta
    write never ran (crash between) — load must RAISE instead of
    silently trimming/shingling in the stale meta's parameter
    space."""
    from cayley_spark.functions.ann_index import _stamp_token, _swap_dir

    base = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    path = str(tmp_path / "sx")
    SubstrDedupIndex.build(base, k=5).save(path)
    assert SubstrDedupIndex.load(spark, path).k == 5  # happy path
    # simulate a crashed re-save with k=7: data swapped, meta not
    wins2 = SubstrDedupIndex.build(base, k=7).wins
    wins2.write.mode("overwrite").parquet(
        os.path.join(path, "wins.save.tmp")
    )
    _stamp_token(
        spark, os.path.join(path, "wins.save.tmp"), "newtoken123"
    )
    _swap_dir(spark, path, "wins")
    with pytest.raises(RuntimeError, match="stale"):
        SubstrDedupIndex.load(spark, path)


def test_compact_preserves_save_token(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(6)],
        "doc_id long, text string",
    )
    lp = str(tmp_path / "l")
    lidx = LSHDedupIndex.build(base, k=3).save(lp)
    lidx.compact()
    assert LSHDedupIndex.load(spark, lp).k == 3  # token rode the swap
    sp = str(tmp_path / "s")
    sidx = SubstrDedupIndex.build(base, k=5).save(sp)
    sidx.compact()
    assert SubstrDedupIndex.load(spark, sp).k == 5


def test_ivf_query_exclude_self_param(spark, tmp_path):
    """exclude_self=False keeps a neighbor whose vector id happens
    to equal an unrelated query id (the namespace-collision case)."""
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) if i else (0, [0.9, 0.1]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    idx = IVFIndex.build(emb, n_centroids=1, vec_col="embedding",
                         id_col="vec_id")
    q = {1: [1.0, 0.0]}  # query id 1 collides with vector id 1
    with_excl = {
        r["neighbor_id"]
        for r in idx.query(q, k=4, nprobe=1).collect()
    }
    without = {
        r["neighbor_id"]
        for r in idx.query(q, k=4, nprobe=1, exclude_self=False).collect()
    }
    assert 1 not in with_excl
    assert without == {0, 1, 2, 3}

"""Regression tests for the round-10 ADVICE fixes.

Each test pins one of the five reviewed defects:
1. streaming fold first-batch guards must distinguish "sketch absent"
   from "sketch unreadable" — a real read error propagates instead of
   silently replacing the accumulated sketch with one batch.
2. GraphStore.save overwrite-swap re-points the live DataFrames so a
   store saved onto its own load path stays usable.
3. bloom_probe rejects an over-broadcast-cap CARRIED geometry before
   collecting the word rows.
4. _swap_dir uses rename-aside (no delete-sized no-target window; a
   stale .old from a crashed swap is cleared on the next one).
5. countmin_estimate raises on declared-vs-carried geometry mismatch
   even when every probe lands on an absent cell (the all-miss path).
"""

import os

import pytest
from pyspark.sql import functions as F

from cayley_spark import GraphStore, IRI


def test_corrupt_sketch_read_propagates(spark, tmp_path):
    """A cells dir that EXISTS but is unreadable must fail the fold,
    not masquerade as 'first batch' and under-count forever."""
    from cayley_spark.streaming.sketches import (
        _countmin_fold,
        _read_last_batch,
    )

    path = str(tmp_path / "cm")
    cells = tmp_path / "cm" / "cells"
    cells.mkdir(parents=True)
    (cells / "part-0.parquet").write_bytes(b"not a parquet file")
    batch = spark.createDataFrame([("a",), ("b",)], "key string")
    with pytest.raises(Exception):
        _countmin_fold(F.col("key"), path, 4, 64)(batch, 0)
    # the junk survived — nothing replaced it
    assert (cells / "part-0.parquet").read_bytes() == b"not a parquet file"

    lb = tmp_path / "cm" / "last_batch"
    lb.mkdir()
    (lb / "part-0.parquet").write_bytes(b"junk")
    with pytest.raises(Exception):
        _read_last_batch(spark, path)


def test_absent_sketch_still_means_first_batch(spark, tmp_path):
    """The legitimate first-batch case (path truly absent) still
    initializes the sketch."""
    from cayley_spark.functions.sketch import countmin_build
    from cayley_spark.streaming.sketches import _countmin_fold

    path = str(tmp_path / "cm_fresh")
    batch = spark.createDataFrame([("a",), ("a",), ("b",)], "key string")
    _countmin_fold(F.col("key"), path, 4, 64)(batch, 0)
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(os.path.join(path, "cells")).collect()
    }
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_build(batch, F.col("key"), 4, 64).collect()
    }
    assert got == want


def test_store_save_onto_own_path_repoints(spark, tmp_path):
    """load() then save() onto the same path: the swap deletes the
    files the lazy DataFrames listed, so save must re-point them —
    subsequent actions on the SAME object read the swapped files."""
    from cayley_spark import Path

    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(
        spark,
        [(IRI("a"), IRI("p"), IRI("b")), (IRI("b"), IRI("p"), IRI("c"))],
    )
    st.save(path)
    loaded = GraphStore.load(spark, path)
    n_before = loaded.quads.count()
    # populate the compile memo with a plan over the PRE-swap files —
    # the second query below must not replay it (the memo's
    # "immutable store" premise breaks on an own-path save)
    assert Path.start(loaded, IRI("b")).in_(IRI("p")).all_values() == ["<a>"]
    loaded.save(path)  # overwrite-swap onto its own source path
    assert loaded.quads.count() == n_before  # old files are gone; must not fail
    assert loaded.nodes.count() > 0
    assert Path.start(loaded, IRI("b")).in_(IRI("p")).all_values() == ["<a>"]


def test_bloom_probe_carried_overcap_raises(spark):
    """A bloom carrying n_bits over the broadcast cap is rejected from
    its geometry row, not after a full collect."""
    from cayley_spark.functions.bloom import MAX_BROADCAST_BITS, bloom_probe

    over = (MAX_BROADCAST_BITS) * 2
    fake = spark.createDataFrame(
        [(0, 1, over, 4)], "word_idx bigint, bits bigint, n_bits bigint, k int"
    )
    probe = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="broadcast cap"):
        bloom_probe(probe, fake, F.col("key"))


def test_swap_dir_rename_aside(spark, tmp_path):
    """Swap leaves the new content in place, no .old residue; a stale
    .old from a crashed prior swap is cleared on entry."""
    from cayley_spark.functions.ann_index import _swap_dir

    base = str(tmp_path / "swap")
    spark.createDataFrame([(1,)], "v int").write.parquet(f"{base}/d")
    spark.createDataFrame([(2,)], "v int").write.parquet(f"{base}/d.save.tmp")
    # simulate a crashed prior swap leaving a stale .old behind
    spark.createDataFrame([(9,)], "v int").write.parquet(f"{base}/d.old")
    _swap_dir(spark, base, "d")
    assert spark.read.parquet(f"{base}/d").head()["v"] == 2
    assert not os.path.exists(f"{base}/d.old")
    assert not os.path.exists(f"{base}/d.save.tmp")


def test_countmin_estimate_all_miss_geometry_raises(spark):
    """Declared geometry that disagrees with the carried one raises
    even when no probe key matches any cell (previously a silent
    est=0 under-count)."""
    from cayley_spark.functions.sketch import countmin_build, countmin_estimate

    df = spark.createDataFrame([("a",), ("b",)], "key string")
    grid = countmin_build(df, F.col("key"), depth=4, width=1024)
    probes = spark.createDataFrame([("zz-not-present",)], "key string")
    with pytest.raises(ValueError, match="geometry mismatch"):
        countmin_estimate(probes, grid, F.col("key"), depth=4, width=512)

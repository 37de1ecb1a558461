"""Round-12 advice regressions: every maintenance entry point of the
substr/LSH index family recovers the _swap_dir crash window (wins/sigs
living only in *.old) instead of failing path-not-found, and
compact_substr_stream clears a stale wins.save.tmp left by a crashed
compaction instead of folding its orphaned sibling partitions into the
swapped-in layout."""

import os

from pyspark.sql import Row

Q = "november oscar papa quebec romeo"


def _rename_aside(spark, path, sub):
    """Simulate a crash between _swap_dir's two renames: the target
    directory is gone, {sub}.old holds the only copy."""
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(path).getFileSystem(sc._jsc.hadoopConfiguration())
    assert fs.rename(
        hp(os.path.join(path, sub)), hp(os.path.join(path, f"{sub}.old"))
    )


def test_compact_stream_recovers_crash_window(spark, tmp_path):
    """compact_substr_stream on an index whose wins lives only in
    wins.old (crashed prior compaction) must restore and fold, like
    _substr_fold and load() already do."""
    from cayley_spark.streaming.substr import (
        _substr_fold,
        compact_substr_stream,
    )

    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold = _substr_fold(path, out, "doc_id", "text", 5, 2)
    fold(spark.createDataFrame([Row(doc_id=1, text=f"alpha {Q} omega end")]), 0)
    fold(
        spark.createDataFrame(
            [Row(doc_id=2, text="different body entirely here now")]
        ),
        1,
    )
    _rename_aside(spark, path, "wins")
    compact_substr_stream(spark, path)  # raised path-not-found pre-fix
    parts = sorted(
        int(r["batch_id"])
        for r in spark.read.parquet(os.path.join(path, "wins"))
        .select("batch_id")
        .distinct()
        .collect()
    )
    assert parts == [1]
    # the folded index still trims the batch-0 passage
    fold(
        spark.createDataFrame([Row(doc_id=9, text=f"fresh copy {Q} tail")]),
        2,
    )
    assert (
        spark.read.parquet(os.path.join(out, "batch_id=2")).head()["n_removed"]
        == 5
    )


def test_compact_stream_clears_stale_tmp(spark, tmp_path):
    """A previously crashed compaction's partial wins.save.tmp must be
    cleared at compact start: its sibling batch partitions would
    otherwise ride into the swapped-in layout forever (each write only
    overwrites its OWN batch_id=* subdirectory)."""
    from cayley_spark.streaming.substr import (
        _substr_fold,
        compact_substr_stream,
    )

    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold = _substr_fold(path, out, "doc_id", "text", 5, 2)
    fold(spark.createDataFrame([Row(doc_id=1, text=f"alpha {Q} omega end")]), 0)
    fold(
        spark.createDataFrame(
            [Row(doc_id=2, text="different body entirely here now")]
        ),
        1,
    )
    # stale leftover from a compaction that crashed mid-write, at a
    # batch id no current write would overwrite
    spark.createDataFrame([(12345,)], "fp bigint").write.parquet(
        os.path.join(path, "wins.save.tmp/batch_id=99")
    )
    compact_substr_stream(spark, path)
    parts = sorted(
        int(r["batch_id"])
        for r in spark.read.parquet(os.path.join(path, "wins"))
        .select("batch_id")
        .distinct()
        .collect()
    )
    assert parts == [1]  # no batch_id=99 ghost partition
    fps = {
        int(r["fp"])
        for r in spark.read.parquet(os.path.join(path, "wins"))
        .select("fp")
        .collect()
    }
    assert 12345 not in fps


def test_substr_index_compact_recovers_crash_window(spark, tmp_path):
    from cayley_spark.functions.dedup_index import SubstrDedupIndex

    path = str(tmp_path / "sidx")
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"alpha {Q} omega closing words"),
            Row(doc_id=2, text=f"second copy {Q} trailing body"),
        ]
    )
    idx = SubstrDedupIndex.build(docs, k=5).save(path)
    idx.append(
        spark.createDataFrame([Row(text="extra appended body here")]),
    )
    _rename_aside(spark, path, "wins")
    idx.compact()  # raised path-not-found pre-fix
    assert not os.path.exists(os.path.join(path, "wins.old"))
    got = SubstrDedupIndex.load(spark, path).trim(
        spark.createDataFrame([Row(doc_id=9, text=f"third copy {Q} body")])
    ).head()
    # "copy {Q}" (from doc 2) and {Q} both hit -> merged 6-token span
    assert got["n_removed"] == 6


def test_lsh_index_compact_recovers_crash_window(spark, tmp_path):
    from cayley_spark.functions.dedup_index import LSHDedupIndex

    path = str(tmp_path / "lidx")
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="the quick brown fox jumps over the lazy dog")
            for i in range(3)
        ]
    )
    idx = LSHDedupIndex.build(docs, k=3, num_hashes=16, bands=4).save(path)
    _rename_aside(spark, path, "sigs")
    idx.compact()  # raised path-not-found pre-fix
    assert not os.path.exists(os.path.join(path, "sigs.old"))
    dup = LSHDedupIndex.load(spark, path).duplicate_ids(
        spark.createDataFrame(
            [Row(doc_id=99, text="the quick brown fox jumps over the lazy dog")]
        ),
        jaccard_threshold=0.5,
    )
    assert [r["doc_id"] for r in dup.collect()] == [99]

"""Streaming ExactSubstr admission (streaming/substr.py): batch-vs-
stream equivalence, cross-batch canonicality, and the crash-replay
exactly-once argument (a replayed batch re-trims against the
PRE-batch index slice even when its own fingerprint append already
landed)."""

import os

import pytest
from pyspark.sql import Row, functions as F

Q = "november oscar papa quebec romeo"


def _snap(df):
    return {
        r["doc_id"]: (
            r["clean_text"],
            r["n_tokens"],
            r["n_removed"],
            r["n_spans"],
        )
        for r in df.collect()
    }


def test_fold_first_batch_equals_direct_dedup(spark, tmp_path):
    """Batch 0 against an empty index == exact_substr_dedup on the
    batch alone (pure within-batch keep-one)."""
    from cayley_spark.functions.dedup import exact_substr_dedup
    from cayley_spark.streaming.substr import _substr_fold

    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{Q} one two three {Q}"),
            Row(doc_id=2, text=f"echo {Q} foxtrot golf"),
            Row(doc_id=3, text="unrelated plain body text here"),
        ]
    )
    _substr_fold(path, out, "doc_id", "text", 5, 2)(b0, 0)
    got = _snap(spark.read.parquet(os.path.join(out, "batch_id=0")))
    want = _snap(exact_substr_dedup(b0, k=5, min_count=2))
    assert got == want
    assert got[1][0] == f"{Q} one two three"  # doc 1 pos 0 is canonical


def test_fold_second_batch_trims_against_cleaned_first(spark, tmp_path):
    """Batch 1 == exact_substr_against(batch1, cleaned batch 0): the
    index holds the CLEANED text's windows, so the stream's verdict
    chains exactly like the batch operators."""
    from cayley_spark.functions.dedup import exact_substr_against
    from cayley_spark.streaming.substr import _substr_fold

    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold = _substr_fold(path, out, "doc_id", "text", 5, 2)
    b0 = spark.createDataFrame(
        [Row(doc_id=1, text=f"alpha {Q} omega closing words")]
    )
    fold(b0, 0)
    cleaned0 = spark.read.parquet(os.path.join(out, "batch_id=0")).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    b1 = spark.createDataFrame(
        [
            Row(doc_id=10, text=f"second copy {Q} trailing body"),
            Row(doc_id=11, text="fresh content with no duplicates"),
        ]
    )
    fold(b1, 1)
    got = _snap(spark.read.parquet(os.path.join(out, "batch_id=1")))
    want = _snap(
        exact_substr_against(b1, cleaned0, k=5, min_count=2)
    )
    assert got == want
    assert got[10][2] == 5  # the corpus copy is canonical; batch loses Q


def test_fold_replay_is_idempotent_even_after_fp_append(spark, tmp_path):
    """The crash window the batch_id<N filter closes: replay a batch
    whose OWN fingerprint append already landed (marker reset to
    simulate the crash before the marker write) — the re-trim must
    not see its own windows as corpus and must rewrite identical
    output."""
    from cayley_spark.streaming.sketches import _write_last_batch
    from cayley_spark.streaming.substr import _substr_fold

    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold = _substr_fold(path, out, "doc_id", "text", 5, 2)
    fold(spark.createDataFrame([Row(doc_id=1, text=f"seed {Q} tail words")]), 0)
    b1 = spark.createDataFrame(
        [Row(doc_id=10, text=f"body with {Q} inside it here")]
    )
    fold(b1, 1)
    first = _snap(spark.read.parquet(os.path.join(out, "batch_id=1")))
    # crash simulation: batch 1 fully wrote docs + fingerprints, but
    # the marker write was lost — foreachBatch replays batch 1
    _write_last_batch(spark, path, 0)
    fold(b1, 1)
    again = _snap(spark.read.parquet(os.path.join(out, "batch_id=1")))
    assert again == first
    # doc 10 still HAS its (now batch-unique) content intact minus
    # the corpus hit — i.e. Q was removed once, not twice
    assert again[10][2] == 5

    # and a replay of an already-marked batch is a no-op (guard path)
    fold(b1, 1)
    assert _snap(
        spark.read.parquet(os.path.join(out, "batch_id=1"))
    ) == first


def test_compact_stream_index_preserves_verdict(spark, tmp_path):
    """compact_substr_stream folds committed batch partitions into
    one distinct set at the last committed id, leaves an orphaned
    (post-crash, pre-marker) partition untouched, and the next
    batch's trim verdict is unchanged."""
    import os as _os

    from cayley_spark.streaming.sketches import _write_last_batch
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
    # crash simulation: batch 2 appended fingerprints but the marker
    # write was lost -> orphaned partition batch_id=2
    b2 = spark.createDataFrame(
        [Row(doc_id=3, text="orphan golf hotel india juliet kilo lima")]
    )
    fold(b2, 2)
    _write_last_batch(spark, path, 1)
    compact_substr_stream(spark, path)
    parts = sorted(
        int(r["batch_id"])
        for r in spark.read.parquet(_os.path.join(path, "wins"))
        .select("batch_id")
        .distinct()
        .collect()
    )
    assert parts == [1, 2]  # 0+1 folded into 1; orphan 2 untouched
    # the orphaned batch replays bit-identically post-compaction
    before = {
        r["doc_id"]: r["clean_text"]
        for r in spark.read.parquet(
            _os.path.join(out, "batch_id=2")
        ).collect()
    }
    fold(b2, 2)
    after = {
        r["doc_id"]: r["clean_text"]
        for r in spark.read.parquet(
            _os.path.join(out, "batch_id=2")
        ).collect()
    }
    assert after == before
    _write_last_batch(spark, path, 2)
    # future batch still loses the batch-0 passage to the corpus
    fold(
        spark.createDataFrame(
            [Row(doc_id=9, text=f"fresh copy {Q} trailing")]
        ),
        3,
    )
    row = spark.read.parquet(_os.path.join(out, "batch_id=3")).head()
    assert row["n_removed"] == 5


def test_fold_recovers_compaction_crash_window(spark, tmp_path):
    """Crash between compaction's two renames (wins gone, wins.old
    the only copy): the next fold must restore it, not trim against
    an empty corpus."""
    import os as _os

    from cayley_spark.streaming.substr import _substr_fold

    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    fold = _substr_fold(path, out, "doc_id", "text", 5, 2)
    fold(spark.createDataFrame([Row(doc_id=1, text=f"alpha {Q} omega end")]), 0)
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(path).getFileSystem(sc._jsc.hadoopConfiguration())
    assert fs.rename(
        hp(_os.path.join(path, "wins")),
        hp(_os.path.join(path, "wins.old")),
    )
    fold(
        spark.createDataFrame(
            [Row(doc_id=5, text=f"replayed copy {Q} body words")]
        ),
        1,
    )
    row = spark.read.parquet(_os.path.join(out, "batch_id=1")).head()
    assert row["n_removed"] == 5  # the accumulated index survived
    assert not _os.path.exists(_os.path.join(path, "wins.old"))


def test_fold_k_mismatch_raises(spark, tmp_path):
    from cayley_spark.streaming.substr import _substr_fold

    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    b = spark.createDataFrame([Row(doc_id=1, text="some words here")])
    _substr_fold(path, out, "doc_id", "text", 5, 2)(b, 0)
    with pytest.raises(ValueError, match="k="):
        _substr_fold(path, out, "doc_id", "text", 7, 2)(b, 1)


def test_stream_end_to_end_available_now(spark, tmp_path):
    """Real writeStream drive: two availableNow passes over a file
    source; the second batch's copy of the first batch's passage is
    trimmed, and SubstrDedupIndex.load can take over the index."""
    from cayley_spark.functions.dedup_index import SubstrDedupIndex
    from cayley_spark.streaming.substr import substr_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    path, out = str(tmp_path / "idx"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.json").write_text(
        '{"doc_id": 1, "text": "alpha %s omega closing words"}\n' % Q
    )
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(src)
    )

    def run_once():
        q = substr_dedup_stream(
            stream, path, out, k=5, min_count=2
        ).trigger(availableNow=True).option(
            "checkpointLocation", ckpt
        ).start()
        q.awaitTermination(120)

    run_once()
    (src / "b.json").write_text(
        '{"doc_id": 2, "text": "later copy %s trailing body"}\n' % Q
    )
    run_once()
    rows = {
        r["doc_id"]: r
        for r in spark.read.parquet(out).collect()
    }
    assert rows[1]["n_removed"] == 0
    assert rows[2]["n_removed"] == 5
    assert "november" not in rows[2]["clean_text"]
    idx = SubstrDedupIndex.load(spark, path)
    assert idx.k == 5
    # a batch pipeline can take over: trimming doc 2's ORIGINAL text
    # against the stream-built index removes the passage again
    redo = idx.trim(
        spark.createDataFrame(
            [Row(doc_id=99, text=f"third copy {Q} appears")]
        )
    ).head()
    assert redo["n_removed"] == 5

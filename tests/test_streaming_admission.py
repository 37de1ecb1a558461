"""Streaming corpus admission (streaming/admission.py): the composed
admit_corpus_batch chain per micro-batch, with the exactly-once
batch-id discipline — committed batches skip, and the destructive
replay case (a crash after the index appends, where re-admission
would return empty and clobber the durable output) recovers by
re-appending the SAVED rows instead."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.dedup_index import (
    LSHDedupIndex,
    SubstrDedupIndex,
)
from cayley_spark.streaming.admission import (
    _admit_fold,
    admit_corpus_stream,
)


def _doc(seed: str, n: int = 40) -> str:
    fill = ("the", "and", "of", "table", "value", "row")
    words = [
        fill[(i // 3) % len(fill)] if i % 3 == 0 else f"{seed}{i}"
        for i in range(n)
    ]
    return "\n".join(
        " ".join(words[i : i + 5]) + "." for i in range(0, n - 4, 5)
    )


PARAMS = dict(
    gopher_min_words=20,
    gopher_stoplist=("the", "and", "of", "table", "value", "row"),
    substr_min_count=2,
    jaccard_threshold=0.3,
)


@pytest.fixture()
def idx_paths(spark, tmp_path):
    c0 = spark.createDataFrame(
        [(100, "s0", _doc("kilo"))],
        "doc_id long, source string, text string",
    )
    sp, lp = str(tmp_path / "sidx"), str(tmp_path / "lidx")
    SubstrDedupIndex.build(c0, k=10).save(sp)
    LSHDedupIndex.build(c0, k=3, num_hashes=16, bands=16).save(lp)
    return sp, lp


def _batch(spark, *rows):
    return spark.createDataFrame(
        list(rows), "doc_id long, source string, text string"
    )


def test_admit_fold_admits_then_gates_next_batch(
    spark, tmp_path, idx_paths
):
    sp, lp = idx_paths
    out = str(tmp_path / "out")
    fold = _admit_fold(sp, lp, out, None, "doc_id", "text", "source", PARAMS)
    fold(_batch(spark, (1, "s1", _doc("lima"))), 0)
    got0 = spark.read.parquet(os.path.join(out, "batch_id=0"))
    assert {r["doc_id"] for r in got0.collect()} == {1}
    # batch 1 duplicates batch 0's doc AND the original corpus: both
    # rejected because batch 0's appends landed
    fold(
        _batch(
            spark, (2, "s1", _doc("lima")), (3, "s0", _doc("kilo")),
            (4, "s2", _doc("mike")),
        ),
        1,
    )
    got1 = spark.read.parquet(os.path.join(out, "batch_id=1"))
    assert {r["doc_id"] for r in got1.collect()} == {4}


def test_admit_fold_committed_replay_is_noop(spark, tmp_path, idx_paths):
    sp, lp = idx_paths
    out = str(tmp_path / "out")
    fold = _admit_fold(sp, lp, out, None, "doc_id", "text", "source", PARAMS)
    fold(_batch(spark, (1, "s1", _doc("papa"))), 0)
    sigs = LSHDedupIndex.load(spark, lp).sigs.count()
    wins = SubstrDedupIndex.load(spark, sp).wins.count()
    fold(_batch(spark, (1, "s1", _doc("papa"))), 0)  # replay committed
    assert LSHDedupIndex.load(spark, lp).sigs.count() == sigs
    assert SubstrDedupIndex.load(spark, sp).wins.count() == wins
    assert {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "batch_id=0")).collect()
    } == {1}


def test_admit_fold_crash_after_appends_recovers_without_clobber(
    spark, tmp_path, idx_paths
):
    """Crash window (b), worst case: durable rows written AND both
    appends landed, marker missing. The replay must NOT re-admit
    (re-admission returns empty — the clobber this module exists to
    prevent); it re-appends the saved rows (idempotent) and commits."""
    from cayley_spark.functions.pipeline import admit_corpus_batch

    sp, lp = idx_paths
    out = str(tmp_path / "out")
    out0 = os.path.join(out, "batch_id=0")
    b0 = _batch(spark, (1, "s1", _doc("romeo")))
    sidx = SubstrDedupIndex.load(spark, sp)
    lidx = LSHDedupIndex.load(spark, lp)
    admit_corpus_batch(
        b0, sidx, lidx, None, num_hashes=16, bands=16, minhash_k=3,
        durable_out=out0, update_indexes=True, **PARAMS
    )  # simulated crash: everything ran, marker never written
    fold = _admit_fold(sp, lp, out, None, "doc_id", "text", "source", PARAMS)
    fold(b0, 0)  # foreachBatch replay
    saved = spark.read.parquet(out0)
    assert {r["doc_id"] for r in saved.collect()} == {1}  # not clobbered
    # the admission is visible to the next batch
    fold(_batch(spark, (2, "s2", _doc("romeo"))), 1)
    assert (
        spark.read.parquet(os.path.join(out, "batch_id=1")).count() == 0
    )
    # the duplicate appends squeeze out under compact, verdict-neutral
    LSHDedupIndex.load(spark, lp).compact()
    SubstrDedupIndex.load(spark, sp).compact()
    fold(_batch(spark, (3, "s3", _doc("romeo"))), 2)
    assert (
        spark.read.parquet(os.path.join(out, "batch_id=2")).count() == 0
    )


def test_admit_fold_crash_before_appends_recovers(
    spark, tmp_path, idx_paths
):
    """Crash window (b), other half: durable rows written, appends
    never ran. The replay re-appends from the saved output, so the
    admission still becomes visible."""
    from cayley_spark.functions.pipeline import admit_corpus_batch

    sp, lp = idx_paths
    out = str(tmp_path / "out")
    out0 = os.path.join(out, "batch_id=0")
    b0 = _batch(spark, (1, "s1", _doc("sierra")))
    sidx = SubstrDedupIndex.load(spark, sp)
    lidx = LSHDedupIndex.load(spark, lp)
    admit_corpus_batch(
        b0, sidx, lidx, None, num_hashes=16, bands=16, minhash_k=3,
        durable_out=out0, update_indexes=False, **PARAMS
    )  # durable write done, crash before any append
    fold = _admit_fold(sp, lp, out, None, "doc_id", "text", "source", PARAMS)
    fold(b0, 0)
    fold(_batch(spark, (2, "s2", _doc("sierra"))), 1)
    assert (
        spark.read.parquet(os.path.join(out, "batch_id=1")).count() == 0
    )


def test_admit_stream_end_to_end_from_wet_files(spark, tmp_path):
    """The crawl on-ramp wired end-to-end: WET segment files arriving
    in a directory -> read_wet_stream -> wet_to_documents ->
    admit_corpus_stream (availableNow, one file per micro-batch) —
    the second file's duplicate of the first file's document is
    rejected because the first batch's appends landed before the
    second batch ran."""
    import gzip
    import time

    from cayley_spark.sources.warc import read_wet_stream, wet_to_documents

    def wet_bytes(recs):
        blob = b""
        for rid, url, text in recs:
            body = text.encode()
            blob += (
                b"WARC/1.0\r\nWARC-Type: conversion\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + b"WARC-Date: 2026-01-05T10:00:00Z\r\n"
                + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body + b"\r\n\r\n"
            )
        return blob

    corpus = spark.createDataFrame(
        [(100, "s0", _doc("tango"))],
        "doc_id long, source string, text string",
    )
    sp, lp = str(tmp_path / "sidx"), str(tmp_path / "lidx")
    SubstrDedupIndex.build(corpus, k=10).save(sp)
    LSHDedupIndex.build(corpus, k=3, num_hashes=16, bands=16).save(lp)

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg-00.warc.wet").write_bytes(
        wet_bytes([("a", "https://alpha.example.com/x", _doc("uniform"))])
    )
    time.sleep(1.1)  # distinct mtimes: file order == batch order
    (src / "seg-01.warc.wet").write_bytes(
        wet_bytes(
            [
                ("b", "https://beta.example.com/y", _doc("uniform")),
                ("c", "https://gamma.example.com/z", _doc("victor")),
            ]
        )
    )
    docs = wet_to_documents(
        read_wet_stream(spark, str(src), maxFilesPerTrigger=1)
    )
    out = str(tmp_path / "admitted")
    q = (
        admit_corpus_stream(
            docs, sp, lp, out, **PARAMS
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    b0 = spark.read.parquet(os.path.join(out, "batch_id=0"))
    b1 = spark.read.parquet(os.path.join(out, "batch_id=1"))
    assert [r["source"] for r in b0.collect()] == ["alpha.example.com"]
    # the uniform-doc copy in seg-01 is rejected; victor admitted
    assert [r["source"] for r in b1.collect()] == ["gamma.example.com"]
    # the output root reads as ONE batch_id-partitioned dataset (the
    # marker lives under _admission/, skipped by the hidden-path
    # filter — a marker dir beside the partitions used to make this
    # read fail with conflicting directory structures)
    whole = spark.read.parquet(out)
    assert "batch_id" in whole.columns
    assert sorted(r["source"] for r in whole.collect()) == [
        "alpha.example.com", "gamma.example.com",
    ]

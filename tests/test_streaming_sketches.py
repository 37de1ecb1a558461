"""Streaming sketch maintenance (streaming/sketches.py): a persisted
Count-Min grid folded per micro-batch must equal the one-pass batch
build over everything the stream delivered (sketch linearity), the
loaded geometry must ride along, and a replayed batch id must be a
no-op (the at-least-once double-count guard)."""

import json
import os

from pyspark.sql import functions as F


def test_countmin_stream_matches_batch_twin(spark, tmp_path):
    from cayley_spark.functions.sketch import (
        countmin_build,
        countmin_estimate,
        countmin_load,
    )
    from cayley_spark.streaming.sketches import countmin_stream

    batches = [
        ["alpha beta alpha", "beta gamma"],
        ["alpha delta", "gamma gamma gamma"],
    ]
    src = tmp_path / "cms_in"
    src.mkdir()
    for i, texts in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for j, t in enumerate(texts):
                f.write(json.dumps({"doc_id": i * 10 + j, "text": t}) + "\n")
        os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    path = str(tmp_path / "cms")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    toks_key = F.explode(F.split("text", " ")).alias("tok")
    q = (
        countmin_stream(
            stream.select(toks_key), F.col("tok"), path, depth=3, width=64
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    grid, depth, width = countmin_load(spark, path)
    assert (depth, width) == (3, 64)
    # linearity: streamed fold == one-pass batch build over the union
    all_toks = spark.createDataFrame(
        [(t,) for texts in batches for s in texts for t in s.split()],
        "tok string",
    )
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_build(
            all_toks, F.col("tok"), depth=3, width=64
        ).collect()
    }
    got = {(r["row"], r["bucket"]): r["cnt"] for r in grid.collect()}
    assert got == want
    # estimates flow through the loaded geometry
    keys = all_toks.select(F.col("tok").alias("key")).distinct()
    est = {
        r["key"]: r["est"]
        for r in countmin_estimate(keys, grid, F.col("key")).collect()
    }
    assert est["alpha"] >= 3 and est["gamma"] >= 4

    # replayed batch id is a no-op (at-least-once replay guard);
    # a FRESH id applies
    from cayley_spark.streaming.sketches import (
        _countmin_fold,
        _read_last_batch,
    )

    last = _read_last_batch(spark, path)
    fold = _countmin_fold(F.col("tok"), path, 3, 64)
    replay = spark.createDataFrame([("alpha",)], "tok string")
    fold(replay, last)  # stale id: must not double-count
    got2 = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_load(spark, path)[0].collect()
    }
    assert got2 == want
    fold(replay, last + 1)  # fresh id: applies
    grid3, _, _ = countmin_load(spark, path)
    est3 = {
        r["key"]: r["est"]
        for r in countmin_estimate(
            keys, grid3, F.col("key")
        ).collect()
    }
    assert est3["alpha"] == est["alpha"] + 1


def test_bloom_stream_matches_batch_twin(spark, tmp_path):
    """Streaming bloom maintenance: the persisted filter after two
    micro-batches equals the one-pass build over the union (bitwise-
    OR composition), is bloom_load-compatible, and probes with
    inherited geometry."""
    from cayley_spark.functions.bloom import (
        bloom_build,
        bloom_load,
        bloom_probe,
    )
    from cayley_spark.streaming.sketches import bloom_stream

    batches = [["doc-a", "doc-b"], ["doc-c", "doc-d", "doc-a"]]
    src = tmp_path / "bl_in"
    src.mkdir()
    for i, texts in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for j, t in enumerate(texts):
                f.write(json.dumps({"doc_id": i * 10 + j, "text": t}) + "\n")
        os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    path = str(tmp_path / "bl")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        bloom_stream(stream, F.col("text"), path, n_bits=1 << 10, k=3)
        .option("checkpointLocation", str(tmp_path / "bl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    words, n_bits, k = bloom_load(spark, os.path.join(path, "bloom"))
    assert (n_bits, k) == (1 << 10, 3)
    got = {
        (r["word_idx"], r["bits"]) for r in words.select("word_idx", "bits").collect()
    }
    all_docs = spark.createDataFrame(
        [(t,) for texts in batches for t in texts], "text string"
    )
    want = {
        (r["word_idx"], r["bits"])
        for r in bloom_build(all_docs, F.col("text"), n_bits=1 << 10, k=3)
        .select("word_idx", "bits")
        .collect()
    }
    assert got == want
    # members probe true through the loaded artifact
    probe = spark.createDataFrame(
        [("doc-a",), ("doc-d",), ("never-seen-doc",)], "text string"
    )
    res = {
        r["text"]: r["maybe_member"]
        for r in bloom_probe(probe, words, F.col("text")).collect()
    }
    assert res["doc-a"] and res["doc-d"]


def test_kmv_stream_matches_batch_twin(spark, tmp_path):
    """Streaming KMV maintenance: the persisted minima after two
    micro-batches equal the one-pass sketch of the union (Beyer et
    al. 2007 union property); replayed batch id is a no-op."""
    from cayley_spark.functions.sketch import kmv_build
    from cayley_spark.streaming.sketches import (
        _kmv_fold,
        _read_last_batch,
        kmv_stream,
    )

    batches = [[f"k{i}" for i in range(20)], [f"k{i}" for i in range(10, 35)]]
    src = tmp_path / "kv_in"
    src.mkdir()
    for i, keys in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for kk in keys:
                f.write(json.dumps({"key": kk}) + "\n")
        os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    path = str(tmp_path / "kv")
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        kmv_stream(stream, F.col("key"), path, k=8)
        .option("checkpointLocation", str(tmp_path / "kv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    minima = spark.read.parquet(os.path.join(path, "minima"))
    got = [(r["rank"], r["h"]) for r in minima.orderBy("rank").collect()]
    union = spark.createDataFrame(
        [(kk,) for keys in batches for kk in keys], "key string"
    )
    want = [
        (r["rank"], r["h"])
        for r in kmv_build(union, F.col("key"), k=8).orderBy("rank").collect()
    ]
    assert got == want
    # stale-id replay is a no-op
    last = _read_last_batch(spark, path)
    _kmv_fold(F.col("key"), path, 8)(
        spark.createDataFrame([("zzz",)], "key string"), last
    )
    again = [
        (r["rank"], r["h"])
        for r in spark.read.parquet(os.path.join(path, "minima"))
        .orderBy("rank")
        .collect()
    ]
    assert again == got

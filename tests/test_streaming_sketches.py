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

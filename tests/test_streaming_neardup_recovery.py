"""Crash/replay discipline for the streaming near-dup operator —
the backfill VERDICT r11 #6 asked for: streaming/substr.py's
admission got equivalence/replay/compaction tests in round 11
(tests/test_streaming_substr.py); streaming/neardup.py predates
that discipline. Its state lives in Spark's checkpointed state
store rather than a parquet sidecar, so the analogous cases are:

- state SURVIVES a stop/restart (the bucket occupants seen before
  the crash still pair with arrivals after it);
- a restart with no new data reprocesses nothing (source tracking);
- a crash in the batch-commit window (offsets written, commit
  marker lost — simulated by deleting the newest checkpoint commit
  file) replays the batch exactly-once: the file sink's manifest
  dedups the replayed write, so readers see no duplicate pairs.
"""

from __future__ import annotations

import json
import os


DOG = "the quick brown fox jumps over the lazy dog"
SCHEMA = "doc_id long, ts timestamp, text string"


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for did, ts, text in rows:
            f.write(
                json.dumps({"doc_id": did, "ts": ts, "text": text})
                + "\n"
            )


def _run(spark, src, out, ckpt):
    from cayley_spark.streaming.neardup import neardup_pairs_stream

    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        neardup_pairs_stream(stream, watermark="1 hour", threshold=0.5)
        .writeStream.format("json")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
        q.awaitTermination(60)


def _pairs(spark, out):
    df = spark.read.schema(
        "id_a long, id_b long, est_jaccard double, band int"
    ).json(out)
    return sorted(
        (r["id_a"], r["id_b"], r["band"]) for r in df.collect()
    )


def test_neardup_stream_recovery_discipline(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # run 1: one dog doc + one unrelated doc — no pairs yet
    _write_batch(
        src,
        "b0.json",
        [
            (1, "2024-01-01 00:00:00", DOG),
            (3, "2024-01-01 00:10:00", "completely unrelated text about spark plans"),
        ],
    )
    _run(spark, src, out, ckpt)
    assert _pairs(spark, out) == []

    # run 2 (RESTART): a copy of doc 1 arrives — the pair proves the
    # bucket state survived the stop/restart (4 bands, exact copy)
    _write_batch(src, "b1.json", [(4, "2024-01-01 00:15:00", DOG)])
    _run(spark, src, out, ckpt)
    after_restart = _pairs(spark, out)
    assert {(a, b) for a, b, _ in after_restart} == {(1, 4)}
    assert len(after_restart) == 4

    # run 3: nothing new — source tracking reprocesses nothing
    _run(spark, src, out, ckpt)
    assert _pairs(spark, out) == after_restart

    # run 4: another copy, then CRASH in the commit window (delete
    # the newest commit marker: offsets say the batch ran, the
    # commit says it didn't — the state-store twin of the substr
    # fold's replayed-batch case)
    _write_batch(src, "b2.json", [(6, "2024-01-01 00:20:00", DOG)])
    _run(spark, src, out, ckpt)
    after_third = _pairs(spark, out)
    assert {(a, b) for a, b, _ in after_third} == {
        (1, 4),
        (1, 6),
        (4, 6),
    }
    commits = os.path.join(ckpt, "commits")
    newest = max(
        (f for f in os.listdir(commits) if not f.startswith(".")),
        key=int,
    )
    os.remove(os.path.join(commits, newest))
    # the local ChecksumFs keeps a .N.crc sidecar the commit write
    # renames over; a real crash on a cluster DFS leaves no such
    # artifact, so drop it with the marker or the replay's rename
    # fails spuriously
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # run 5 (REPLAY): the batch re-executes from the rolled-back
    # state version; the file sink's manifest already holds its
    # output, so readers must see NO duplicate pairs
    _run(spark, src, out, ckpt)
    assert _pairs(spark, out) == after_third

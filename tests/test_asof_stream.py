"""Streaming as-of join (streaming/asof.py): the applyInPandasWithState
enrichment operator against its batch twin (operators/joins.asof_join)
and the documented stream-order contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cayley_spark.operators.joins import asof_join
from cayley_spark.streaming.asof import asof_join_stream


PROBES = [
    (1, "A", "2024-01-01 00:05:00"),
    (2, "A", "2024-01-01 00:10:00"),
    (3, "B", "2024-01-01 00:07:00"),
    (4, "B", "2024-01-01 00:02:00"),  # before any quote
    (5, "C", "2024-01-01 00:09:00"),  # key with no quotes
    (6, "A", None),                   # NULL-ts probe matches nothing
]
QUOTES = [
    ("A", "2024-01-01 00:04:00", 99.5),
    ("A", "2024-01-01 00:05:00", 99.9),  # exact-ts for probe 1
    ("A", "2024-01-01 00:08:00", 100.5),
    ("B", "2024-01-01 00:06:00", 48.5),
    ("B", None, 7.0),                    # NULL-ts quote never matches
]


def _write_stream_files(tmp_path, name, rows, cols, batches):
    """Write `rows` as `batches` json files (one file per micro-batch
    with maxFilesPerTrigger=1). File names sort in batch order."""
    d = tmp_path / name
    d.mkdir()
    per = [rows[i::batches] for i in range(batches)] if batches > 1 else [rows]
    for b, chunk in enumerate(per):
        with open(d / f"b{b}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(dict(zip(cols, r))) + "\n")
    return str(d)


def _run_stream(spark, tmp_path, probes_dir, quotes_dir, qname, **kw):
    probes = (
        spark.readStream.schema("pid long, sym string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(probes_dir)
    )
    quotes = (
        spark.readStream.schema("sym string, ts timestamp, bid double")
        .option("maxFilesPerTrigger", 1)
        .json(quotes_dir)
    )
    out = asof_join_stream(probes, quotes, on="sym", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(qname)


@pytest.mark.parametrize("exact", [True, False])
def test_single_batch_equals_batch_operator(spark, tmp_path, exact):
    """All data in ONE micro-batch: the sorted fold must reproduce the
    batch operator row-for-row, both exactness modes."""
    pd_dir = _write_stream_files(
        tmp_path, f"p{exact}", PROBES, ("pid", "sym", "ts"), 1
    )
    qd_dir = _write_stream_files(
        tmp_path, f"q{exact}", QUOTES, ("sym", "ts", "bid"), 1
    )
    got = _run_stream(
        spark, tmp_path, pd_dir, qd_dir, f"asof_s_{exact}",
        allow_exact=exact,
    )
    bp = spark.createDataFrame(PROBES, "pid long, sym string, ts string").select(
        "pid", "sym", F.col("ts").cast("timestamp").alias("ts")
    )
    bq = spark.createDataFrame(QUOTES, "sym string, ts string, bid double").select(
        "sym", F.col("ts").cast("timestamp").alias("ts"), "bid"
    )
    want = asof_join(bp, bq, on="sym", allow_exact=exact)
    canon = lambda df: sorted(  # noqa: E731
        tuple(str(r[c]) for c in sorted(df.columns)) for r in df.collect()
    )
    assert got.columns == want.columns
    assert canon(got) == canon(want)


def test_cross_batch_state_carry(spark, tmp_path):
    """Quotes arriving in earlier micro-batches enrich later probes
    through the per-key state (file b0 = quotes, b1 = probes)."""
    qd = tmp_path / "qs"
    qd.mkdir()
    with open(qd / "b0.json", "w") as f:
        f.write(json.dumps({"sym": "A", "ts": "2024-01-01 00:04:00", "bid": 99.5}) + "\n")
    pdir = tmp_path / "ps"
    pdir.mkdir()
    with open(pdir / "b1.json", "w") as f:
        f.write(json.dumps({"pid": 1, "sym": "A", "ts": "2024-01-01 00:05:00"}) + "\n")
    got = _run_stream(spark, tmp_path, str(pdir), str(qd), "asof_carry")
    rows = got.collect()
    # whichever batch interleaving availableNow picks, the quote
    # precedes or accompanies the probe here — the match must land
    assert len(rows) == 1
    assert rows[0]["bid"] == 99.5
    assert str(rows[0]["ts_right"]) == "2024-01-01 00:04:00"


def test_late_quote_does_not_retromatch(spark, tmp_path):
    """The documented O(1)-state limit: a quote arriving in a LATER
    micro-batch than the probe does not retro-match — the probe was
    already emitted with NULLs."""
    pdir = tmp_path / "ps2"
    pdir.mkdir()
    with open(pdir / "a0.json", "w") as f:  # sorts BEFORE quotes file
        f.write(json.dumps({"pid": 1, "sym": "A", "ts": "2024-01-01 00:05:00"}) + "\n")
    qd = tmp_path / "qs2"
    qd.mkdir()
    with open(qd / "z9.json", "w") as f:  # arrives in a later batch
        f.write(json.dumps({"sym": "A", "ts": "2024-01-01 00:04:00", "bid": 99.5}) + "\n")

    # force batch separation: run probes first, then add the quote
    probes = (
        spark.readStream.schema("pid long, sym string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(pdir))
    )
    quotes = (
        spark.readStream.schema("sym string, ts timestamp, bid double")
        .option("maxFilesPerTrigger", 1)
        .json(str(qd))
    )
    out = asof_join_stream(probes, quotes, on="sym")
    sink = str(tmp_path / "out_late")
    writer = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
    )
    # batch 1: only the probe exists (the quote file is written after)
    import shutil

    staged = str(qd / "z9.json")
    moved = str(tmp_path / "z9.json.hold")
    shutil.move(staged, moved)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    shutil.move(moved, staged)
    q = writer.trigger(availableNow=True).start()  # batch 2: the quote
    q.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1 and rows[0]["bid"] is None  # no retro-match


def test_quote_state_updates_across_batches(spark, tmp_path):
    """Newer quotes replace state across batches; older late quotes
    are dropped (state keeps the latest only)."""
    import shutil

    qd = tmp_path / "qs3"
    qd.mkdir()
    pdir = tmp_path / "ps3"
    pdir.mkdir()
    with open(qd / "b0.json", "w") as f:
        f.write(json.dumps({"sym": "A", "ts": "2024-01-01 00:06:00", "bid": 2.0}) + "\n")
    # a LATE quote, older than state — must be ignored
    late = tmp_path / "late.json.hold"
    with open(late, "w") as f:
        f.write(json.dumps({"sym": "A", "ts": "2024-01-01 00:03:00", "bid": 1.0}) + "\n")
    hold_probe = tmp_path / "probe.json.hold"
    with open(hold_probe, "w") as f:
        f.write(json.dumps({"pid": 9, "sym": "A", "ts": "2024-01-01 00:10:00"}) + "\n")

    probes = (
        spark.readStream.schema("pid long, sym string, ts timestamp")
        .option("maxFilesPerTrigger", 1).json(str(pdir))
    )
    quotes = (
        spark.readStream.schema("sym string, ts timestamp, bid double")
        .option("maxFilesPerTrigger", 1).json(str(qd))
    )
    out = asof_join_stream(probes, quotes, on="sym")
    sink = str(tmp_path / "out_upd")
    writer = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_upd"))
    )
    q = writer.trigger(availableNow=True).start()  # state <- 00:06 quote
    q.awaitTermination(120)
    shutil.move(str(late), str(qd / "b1.json"))
    q = writer.trigger(availableNow=True).start()  # late older quote dropped
    q.awaitTermination(120)
    shutil.move(str(hold_probe), str(pdir / "b2.json"))
    q = writer.trigger(availableNow=True).start()  # probe matches 00:06
    q.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    assert rows[0]["bid"] == 2.0
    assert str(rows[0]["ts_right"]) == "2024-01-01 00:06:00"


def test_stream_multi_key(spark, tmp_path):
    """Composite join keys through the stateful fold (group key is a
    tuple; probe columns re-assembled positionally)."""
    probes = [(1, 0, "x", "2024-01-01 00:05:00"), (2, 1, "x", "2024-01-01 00:05:00")]
    quotes = [(0, "x", "2024-01-01 00:04:00", 1.5), (1, "x", "2024-01-01 00:03:00", 2.5)]
    pdir = tmp_path / "pm"
    pdir.mkdir()
    with open(pdir / "b0.json", "w") as f:
        for pid, a, b, ts in probes:
            f.write(json.dumps({"pid": pid, "a": a, "b": b, "ts": ts}) + "\n")
    qdir = tmp_path / "qm"
    qdir.mkdir()
    with open(qdir / "b0.json", "w") as f:
        for a, b, ts, bid in quotes:
            f.write(json.dumps({"a": a, "b": b, "ts": ts, "bid": bid}) + "\n")
    p = spark.readStream.schema("pid long, a long, b string, ts timestamp").json(str(pdir))
    q = spark.readStream.schema("a long, b string, ts timestamp, bid double").json(str(qdir))
    out = asof_join_stream(p, q, on=["a", "b"])
    h = (
        out.writeStream.format("memory").queryName("asof_mk")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mk"))
        .trigger(availableNow=True)
        .start()
    )
    h.awaitTermination(120)
    rows = {r["pid"]: (r["a"], r["b"], r["bid"]) for r in spark.table("asof_mk").collect()}
    assert rows == {1: (0, "x", 1.5), 2: (1, "x", 2.5)}


def test_state_expiry_with_watermark(spark, tmp_path):
    """expire_after_seconds drops a key's quote state once the
    watermark passes quote_ts + ttl: a later probe gets NULLs (the
    documented eviction trade); fresh keys keep matching."""
    import shutil

    qd = tmp_path / "qe"
    qd.mkdir()
    pdir = tmp_path / "pe"
    pdir.mkdir()
    hold = tmp_path / "hold"
    hold.mkdir()

    def jline(d, name, **row):
        with open(d / name, "w") as f:
            f.write(json.dumps(row) + "\n")

    # staged files, released one run at a time
    jline(qd, "b0.json", sym="A", ts="2024-01-01 10:00:00", bid=1.0)
    jline(hold, "q_b1.json", sym="C", ts="2024-01-01 11:00:00", bid=3.0)
    jline(hold, "p_b1.json", pid=7, sym="C", ts="2024-01-01 11:00:00")
    jline(hold, "q_b2.json", sym="D", ts="2024-01-01 11:00:10", bid=4.0)
    jline(hold, "p_b3.json", pid=1, sym="A", ts="2024-01-01 11:00:20")

    probes = (
        spark.readStream.schema("pid long, sym string, ts timestamp")
        .json(str(pdir))
        .withWatermark("ts", "1 second")
    )
    quotes = (
        spark.readStream.schema("sym string, ts timestamp, bid double")
        .json(str(qd))
        .withWatermark("ts", "1 second")
    )
    out = asof_join_stream(
        probes, quotes, on="sym", expire_after_seconds=60.0
    )
    sink = str(tmp_path / "out_exp")
    writer = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_exp"))
    )

    def run():
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)

    run()  # batch 1: quote A enters state
    shutil.move(str(hold / "q_b1.json"), str(qd / "b1.json"))
    shutil.move(str(hold / "p_b1.json"), str(pdir / "b1.json"))
    run()  # batch 2: C matches; watermark advances past A's ttl
    shutil.move(str(hold / "q_b2.json"), str(qd / "b2.json"))
    run()  # batch 3: A (no data in batch) times out, state dropped
    shutil.move(str(hold / "p_b3.json"), str(pdir / "b3.json"))
    run()  # batch 4: the late probe for A finds nothing
    rows = {r["pid"]: r["bid"] for r in spark.read.parquet(sink).collect()}
    assert rows[7] == 3.0  # the fresh key matched normally
    assert rows[1] is None  # A's state expired before the probe


def test_expiry_requires_watermark_and_timestamps(spark, tmp_path):
    probes = spark.readStream.schema(
        "pid long, sym string, ts timestamp"
    ).json(str(tmp_path))
    quotes = spark.readStream.schema(
        "sym string, ts timestamp, bid double"
    ).json(str(tmp_path))
    with pytest.raises(ValueError, match="withWatermark"):
        asof_join_stream(
            probes, quotes, on="sym", expire_after_seconds=30.0
        )
    p2 = spark.readStream.schema("pid long, sym string, ts double").json(
        str(tmp_path)
    )
    q2 = spark.readStream.schema("sym string, ts double, bid double").json(
        str(tmp_path)
    )
    with pytest.raises(ValueError, match="timestamp-typed"):
        asof_join_stream(p2, q2, on="sym", expire_after_seconds=30.0)

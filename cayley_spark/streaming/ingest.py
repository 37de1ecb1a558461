"""Structured Streaming ingest — the quad store as a live table.

The reference has NO streaming operators (SURVEY.md §2.8): its closest
analogs are the batch quad.Reader/Writer load pipeline
(/root/reference/cmd/cayley/command/database.go:88-141) and the delta
log (/root/reference/graph/log/graphlog.go:37-44). This module is the
Spark-native extension of that write model: an append-only stream of
quad deltas feeding the same nodes/quads parquet layout that
``GraphStore.load`` reads, plus watermark/windowed monitoring ops.

Design for scale: ingest is `readStream.text` → the SAME single-regex
term parser the batch reader uses → `foreachBatch` appends. Each
micro-batch derives its node-dictionary increment from its own quads
(idempotent hashes — duplicate dictionary rows across batches are
resolved at load time by `GraphStore.load`'s dedup, keeping the
ingest path shuffle-free)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.nquads import _TERM
from ..store import GraphStore


def read_quad_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming DataFrame[st, pt, ot, lt] of n-quad term strings from
    files appearing under ``path`` (the streaming twin of
    sources.nquads.read_nquads)."""
    lines = spark.readStream.text(path)
    toks = lines.where(~F.col("value").rlike(r"^\s*(#.*)?$")).select(
        F.regexp_extract_all("value", F.lit(f"({_TERM})"), 1).alias("ts")
    )
    n = F.size("ts")
    return toks.where((n == 3) | (n == 4)).select(
        F.get("ts", 0).alias("st"),
        F.get("ts", 1).alias("pt"),
        F.get("ts", 2).alias("ot"),
        F.when(n == 4, F.get("ts", 3)).alias("lt"),
    )


def stream_to_store(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    trigger_available_now: bool = False,
):
    """Continuously append a term-quad stream into the parquet store
    layout (``{store_path}/quads``, ``{store_path}/nodes``). Returns
    the StreamingQuery. Read the result with ``GraphStore.load``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        st = GraphStore.from_term_quads(batch_df)
        st.quads.write.mode("append").parquet(f"{store_path}/quads")
        st.nodes.write.mode("append").parquet(f"{store_path}/nodes")

    w = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def edge_rate(
    stream: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed edge counts per predicate over an ingest stream with
    event-time = arrival time: the Structured-Streaming analog of the
    reference's Gephi live streamer (internal/gephi/stream.go). Late
    rows beyond the watermark are dropped."""
    with_ts = stream.withColumn("ts", F.current_timestamp())
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col("pt"))
        .agg(F.count(F.lit(1)).alias("edges"))
    )

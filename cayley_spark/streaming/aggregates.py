"""Streaming windowed aggregates — the incremental twin of the batch
rollup queries.

The reference has no streaming surface (SURVEY.md §2.8); a
training-data/events pipeline needs the same hourly rollups
incrementally. Built entirely on Structured Streaming built-ins
(window + watermark), so state management, late-data handling, and
incremental emission are the engine's own — no custom operator code
on this path, which is exactly how it should be at 100 TB: windowed
aggregation state is partitioned by (window, keys), watermark expiry
bounds it to the late-data horizon, and append-mode emission yields
each window once, when it closes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-window, per-key event counts and value sums.

    Works on BOTH batch and streaming inputs — the same declarative
    plan incrementalizes under ``writeStream`` (append mode: a window
    emits once the watermark passes its end, so late events within
    ``watermark`` still land in their window; later ones are dropped,
    which is the documented contract). Returns
    (window_start, key, n, sum_value)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("__w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col)).alias("sum_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col(key_col),
            "n",
            "sum_value",
        )
    )

"""Streaming sketch maintenance: keep a PERSISTED summary current as
data arrives, without state-store growth.

The batch sketches (functions/sketch.py, functions/bloom.py) compose
under merge — Count-Min grids add cell-wise, blooms OR, KMV unions —
so a stream maintains the corpus summary by folding each
micro-batch's own (bounded) sketch into the saved artifact inside
``foreachBatch``. State lives in the parquet sketch, not Spark's
state store: zero per-key state, no watermark, no eviction contract,
and any batch job can read the current summary concurrently.

Restart safety: ``foreachBatch`` re-delivers a batch after a crash
(at-least-once), and a sketch merge is NOT idempotent — re-merging a
batch double-counts. Each fold therefore records the micro-batch id
in a 1-row sidecar and skips ids it has already applied, making the
maintenance exactly-once per batch id (the standard foreachBatch
dedup discipline from the Structured Streaming guide).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F


def _read_last_batch(spark, path: str) -> int:
    try:
        row = spark.read.parquet(os.path.join(path, "last_batch")).head()
        return int(row["batch_id"]) if row is not None else -1
    except Exception:
        return -1


def _write_last_batch(spark, path: str, batch_id: int) -> None:
    spark.createDataFrame(
        [(int(batch_id),)], "batch_id long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "last_batch")
    )


def countmin_stream(
    docs: DataFrame,
    key: Column,
    path: str,
    depth: int = 4,
    width: int = 1024,
):
    """Maintain a persisted Count-Min grid at ``path`` over a
    streaming DataFrame: per micro-batch, build the batch's own
    d×w-bounded grid and fold it into the saved sketch via
    countmin_merge — sketch linearity makes the result EXACTLY the
    one-pass batch build over everything applied so far
    (test-pinned against the batch twin). Returns the foreachBatch
    writer (caller picks trigger/checkpoint and starts it).

    The grid is ≤ depth·width rows by construction, so the fold
    materializes it driver-side (bounded, like bloom_probe's packed
    words) and rewrites the cells file — O(grid) per batch, never
    O(stream history)."""
    return docs.writeStream.foreachBatch(
        _countmin_fold(key, path, depth, width)
    )


def _countmin_fold(key: Column, path: str, depth: int, width: int):
    """The per-batch fold countmin_stream installs — exposed so tests
    can drive replay semantics directly (same batch id twice must be
    a no-op)."""
    from ..functions.sketch import _check

    _check(depth, width)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.sketch import countmin_build

        spark = batch_df.sparkSession
        if batch_id <= _read_last_batch(spark, path):
            return  # crash-replay of an already-applied batch
        grid = countmin_build(batch_df, key, depth, width)
        cells = {
            (int(r["row"]), int(r["bucket"])): int(r["cnt"])
            for r in grid.collect()  # bounded: <= depth*width rows
        }
        cur = os.path.join(path, "cells")
        try:
            for r in spark.read.parquet(cur).collect():
                k = (int(r["row"]), int(r["bucket"]))
                cells[k] = cells.get(k, 0) + int(r["cnt"])
        except Exception:
            pass  # first batch: no grid yet
        merged = spark.createDataFrame(
            [
                (rw, b, c, int(depth), int(width))
                for (rw, b), c in sorted(cells.items())
            ],
            "row int, bucket bigint, cnt bigint, depth int, width bigint",
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "cells.save.tmp")
        )
        # staged rename (read-while-overwrite safe). Crash ordering:
        # marker AFTER swap means a crash in between re-folds exactly
        # one batch on replay (over-count) — the safe direction for a
        # sketch whose contract is "never under-counts"; marker-first
        # would risk LOSING a batch (under-count) instead.
        from ..functions.ann_index import _swap_dir

        _swap_dir(spark, path, "cells")
        _write_last_batch(spark, path, batch_id)

    return _fold

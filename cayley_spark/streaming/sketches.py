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


def _path_exists(spark, path: str) -> bool:
    """Explicit Hadoop-FS existence probe. The folds used to wrap
    their reads in bare try/except — which treated ANY read failure
    (transient FS error, corrupt footer, permission blip) as 'no
    sketch yet' and silently REPLACED the accumulated sketch with
    just the current batch: a permanent under-count that violates
    the Count-Min never-under-counts contract. Existence is the only
    condition that legitimately means 'first batch'; every other
    error must propagate so the batch fails and foreachBatch retries
    it against the intact artifact."""
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    p = hp(path)
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs.exists(p)


def _read_last_batch(spark, path: str) -> int:
    from ..functions.ann_index import _recover_swap

    # the marker itself is staged-swapped (below): restore the
    # crash-between-renames window before probing
    _recover_swap(spark, path, "last_batch")
    marker = os.path.join(path, "last_batch")
    if not _path_exists(spark, marker):
        return -1  # stream has never committed a batch here
    row = spark.read.parquet(marker).head()
    return int(row["batch_id"]) if row is not None else -1


def _write_last_batch(spark, path: str, batch_id: int) -> None:
    # staged swap, NOT a plain overwrite: Spark's static overwrite
    # deletes the existing files before the job commits, so a crash
    # mid-write would leave a marker dir with no readable parquet —
    # _read_last_batch would then throw on EVERY subsequent batch and
    # wedge the stream until someone hand-deletes the dir. With the
    # rename swap the marker is always either the old value or the
    # new one.
    from ..functions.ann_index import _swap_dir

    spark.createDataFrame(
        [(int(batch_id),)], "batch_id long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "last_batch.save.tmp")
    )
    _swap_dir(spark, path, "last_batch")


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
        from ..functions.ann_index import _recover_swap

        # if a crash landed between a prior swap's two renames, the
        # accumulated grid lives only in cells.old — restore it BEFORE
        # the existence probe, or this fold would treat the batch as
        # the first one and permanently under-count
        _recover_swap(spark, path, "cells")
        cur = os.path.join(path, "cells")
        if _path_exists(spark, cur):  # else first batch: no grid yet
            saved = spark.read.parquet(cur).collect()
            if saved and (
                int(saved[0]["depth"]) != int(depth)
                or int(saved[0]["width"]) != int(width)
            ):
                # the _substr_fold discipline: a restart with
                # different geometry must FAIL, not silently add old
                # counts into cells the new hash layout never probes
                # (a permanent under-count) while re-stamping the
                # rows with the new depth/width — which would also
                # erase the evidence countmin_estimate's own
                # geometry validator checks for
                raise ValueError(
                    f"countmin stream at {path} carries grid geometry "
                    f"depth={int(saved[0]['depth'])}/"
                    f"width={int(saved[0]['width'])}; this stream "
                    f"declares {depth}/{width} — hash layouts are "
                    "disjoint. Restart with the original geometry or "
                    "rebuild the sketch."
                )
            for r in saved:
                k = (int(r["row"]), int(r["bucket"]))
                cells[k] = cells.get(k, 0) + int(r["cnt"])
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


def bloom_stream(
    docs: DataFrame,
    key: Column,
    path: str,
    n_bits: int = 1 << 20,
    k: int = 4,
):
    """Maintain a persisted bloom filter at ``path`` over a stream:
    per micro-batch, build the batch's own (≤ n_bits/64-row) bloom
    and OR it into the saved words via bloom_merge semantics — bit
    arrays compose, so the maintained filter answers membership over
    everything applied so far exactly as a one-pass build would
    (test-pinned). The artifact at ``{path}/bloom`` is
    bloom_save-compatible: any batch job bloom_loads it for
    admission gating while the stream keeps it current. Same batch-id replay guard as countmin_stream; the
    only crash window re-ORs one batch, which for a bloom is a
    no-op (idempotent bitwise OR — the one sketch where replay is
    actually harmless)."""
    from ..functions.bloom import _check

    _check(n_bits, k)
    return docs.writeStream.foreachBatch(
        _bloom_fold(key, path, n_bits, k)
    )


def _bloom_fold(key: Column, path: str, n_bits: int, k: int):
    from ..functions.bloom import _check, bloom_build, bloom_save

    _check(n_bits, k)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= _read_last_batch(spark, path):
            return
        batch_bloom = bloom_build(batch_df, key, n_bits, k)
        words = {
            int(r["word_idx"]): int(r["bits"])
            for r in batch_bloom.collect()  # <= n_bits/64 rows
        }
        from ..functions.ann_index import _recover_swap

        _recover_swap(spark, path, "bloom")  # crash-window .old restore
        saved_words = os.path.join(path, "bloom", "words")
        if _path_exists(spark, saved_words):  # else first batch
            saved_meta = spark.read.parquet(
                os.path.join(path, "bloom", "meta")
            ).head()
            if (int(saved_meta["n_bits"]), int(saved_meta["k"])) != (
                int(n_bits), int(k),
            ):
                # same geometry gate as the countmin fold: ORing word
                # bits positioned mod old-n_bits into a filter probed
                # mod new-n_bits yields FALSE NEGATIVES — the one
                # failure a bloom must never have — and bloom_save
                # would rewrite the meta with the new geometry,
                # blinding bloom_probe's own declared-vs-carried check
                raise ValueError(
                    f"bloom stream at {path} carries geometry "
                    f"n_bits={int(saved_meta['n_bits'])}/"
                    f"k={int(saved_meta['k'])}; this stream declares "
                    f"{n_bits}/{k} — bit positions are disjoint. "
                    "Restart with the original geometry or rebuild."
                )
            for r in spark.read.parquet(saved_words).collect():
                w = int(r["word_idx"])
                words[w] = words.get(w, 0) | int(r["bits"])
        merged = spark.createDataFrame(
            [
                (w, b, int(n_bits), int(k))
                for w, b in sorted(words.items())
            ],
            "word_idx bigint, bits bigint, n_bits bigint, k int",
        )
        # bloom_save writes words + the (n_bits, k) meta sidecar and
        # validates carried geometry; stage the whole filter dir then
        # swap so concurrent readers never see a half-written filter
        bloom_save(merged, os.path.join(path, "bloom.save.tmp"))
        from ..functions.ann_index import _swap_dir

        _swap_dir(spark, path, "bloom")
        _write_last_batch(spark, path, batch_id)

    return _fold


def kmv_stream(docs: DataFrame, key: Column, path: str, k: int = 256):
    """Maintain a persisted KMV distinct-count sketch at ``path``
    over a stream: per micro-batch, sketch the batch and take the k
    smallest of the union with the saved survivors — the Beyer et
    al. 2007 multiset-union property makes the maintained sketch
    EXACTLY the one-pass sketch of everything applied so far
    (test-pinned). Like the bloom fold, a replayed batch is
    mathematically a no-op (set union is idempotent), but the
    batch-id guard still skips it to avoid the wasted rewrite."""
    return docs.writeStream.foreachBatch(_kmv_fold(key, path, k))


def _kmv_fold(key: Column, path: str, k: int):
    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.sketch import kmv_build

        spark = batch_df.sparkSession
        if batch_id <= _read_last_batch(spark, path):
            return
        batch_sk = kmv_build(batch_df, key, k=k)
        hashes = {r["h"] for r in batch_sk.collect()}  # <= k rows
        from ..functions.ann_index import _recover_swap

        _recover_swap(spark, path, "minima")  # crash-window .old restore
        saved_minima = os.path.join(path, "minima")
        if _path_exists(spark, saved_minima):  # else first batch
            saved = spark.read.parquet(saved_minima).collect()
            if saved and int(saved[0]["k"]) != int(k):
                # a GROWN k is silently biased: ranks old_k+1..k of
                # the union fill from survivors, but the true
                # (old_k+1)-th..k-th minima of the history were
                # discarded, so h_k is too large and the estimate
                # under-counts — and the merged rows would be
                # re-stamped with the new k, erasing the evidence.
                # (Shrinking is mathematically valid, but the crisp
                # contract is: one k per sketch; rebuild to change.)
                raise ValueError(
                    f"kmv stream at {path} carries k="
                    f"{int(saved[0]['k'])}; this stream declares "
                    f"k={k} — estimates would be biased. Restart "
                    "with the original k or rebuild the sketch."
                )
            for r in saved:
                hashes.add(r["h"])
        top = sorted(hashes)[:k]
        merged = spark.createDataFrame(
            [(i + 1, h, int(k)) for i, h in enumerate(top)],
            "rank int, h string, k int",
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "minima.save.tmp")
        )
        from ..functions.ann_index import _swap_dir

        _swap_dir(spark, path, "minima")
        _write_last_batch(spark, path, batch_id)

    return _fold


def sample_stream(
    docs: DataFrame, key: Column, value: Column, path: str, k: int = 256
):
    """Maintain a persisted bottom-k SAMPLE sketch at ``path`` over a
    stream (the quantile member of this maintenance family): per
    micro-batch, sketch the batch and keep the k smallest-digest
    (key, value) survivors of the union with the saved sample — the
    same multiset-union property as KMV makes the maintained sample
    EXACTLY the one-pass sample of everything applied so far
    (test-pinned), so quantiles over a month of stream equal
    quantiles over the month's batch build. Replay of a committed
    batch is mathematically a no-op (set semantics on digests + the
    deterministic min-value rule); the batch-id guard still skips the
    wasted rewrite."""
    return docs.writeStream.foreachBatch(_sample_fold(key, value, path, k))


def _sample_fold(key: Column, value: Column, path: str, k: int):
    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.sketch import sample_sketch_build

        spark = batch_df.sparkSession
        if batch_id <= _read_last_batch(spark, path):
            return
        batch_sk = sample_sketch_build(batch_df, key, value, k=k)
        pairs = {r["h"]: r["v"] for r in batch_sk.collect()}  # <= k rows
        from ..functions.ann_index import _recover_swap, _swap_dir

        _recover_swap(spark, path, "sample")
        saved_dir = os.path.join(path, "sample")
        if _path_exists(spark, saved_dir):  # else first batch
            saved = spark.read.parquet(saved_dir).collect()
            if saved and int(saved[0]["k"]) != int(k):
                raise ValueError(
                    f"sample stream at {path} carries k="
                    f"{int(saved[0]['k'])}; this stream declares k={k} "
                    "— the sample would be biased. Restart with the "
                    "original k or rebuild."
                )
            for r in saved:
                h, v = r["h"], r["v"]
                pairs[h] = v if h not in pairs else min(pairs[h], v)
        top = sorted(pairs.items())[:k]
        merged = spark.createDataFrame(
            [(i + 1, h, float(v), int(k)) for i, (h, v) in enumerate(top)],
            "rank int, h string, v double, k int",
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "sample.save.tmp")
        )
        _swap_dir(spark, path, "sample")
        _write_last_batch(spark, path, batch_id)

    return _fold

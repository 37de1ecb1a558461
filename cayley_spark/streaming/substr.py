"""Streaming ExactSubstr admission — the writeStream face of
``dedup_index.SubstrDedupIndex`` (the same role streaming/sketches.py
plays for the sketch family): per micro-batch, trim the batch against
the window-fingerprint index accumulated from every EARLIER batch,
emit the cleaned rows, and append the cleaned text's fingerprints —
so the corpus-wide at-most-one-copy invariant is maintained
incrementally as the stream arrives.

Exactly-once without a transactional sink: every write is keyed by
batch id —

- cleaned rows land in ``{out_path}/batch_id=N/`` (mode=overwrite, so
  a crash-replayed batch rewrites the same rows);
- the batch's fingerprints land in ``{path}/wins/batch_id=N/``
  (overwrite again);
- and, decisively, each batch is trimmed against
  ``wins WHERE batch_id < N`` (a partition-PRUNED scan), so a replay
  sees exactly the pre-batch index even when the crash landed after
  its own fingerprint append — the re-trim is bit-identical and the
  overwrites converge. The countmin_stream folds need their
  marker-ordering argument because a sketch fold is cumulative; here
  both writes are per-batch-keyed, so the last_batch marker is only a
  skip-work guard, not a correctness boundary.

The ``{path}`` directory stays loadable by ``SubstrDedupIndex.load``
(meta rides along; the extra ``batch_id`` partition column in wins is
ignored by the fingerprint semi-join), so a batch pipeline can take
over the index a stream built, and vice versa a stream can extend a
batch-built index only via its own layout (start streams on their own
index path or compact() the flat files into it first).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from .sketches import _path_exists, _read_last_batch, _write_last_batch


def substr_dedup_stream(
    docs: DataFrame,
    path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
):
    """foreachBatch writer maintaining a streaming ExactSubstr
    admission loop at ``path`` (index) / ``out_path`` (cleaned rows).
    Returns the writer; the caller picks trigger/checkpoint and
    starts it. Batch-vs-stream equivalence and crash-replay
    idempotence are test-pinned (tests/test_streaming_substr.py)."""
    return docs.writeStream.foreachBatch(
        _substr_fold(path, out_path, id_col, text_col, k, min_count)
    )


def compact_substr_stream(spark, path: str) -> None:
    """Offline compaction of a streaming substr index: fold every
    COMMITTED ``wins/batch_id=*`` partition (batch_id ≤ the
    last_batch marker) into one distinct fingerprint set stored at
    ``batch_id=<last_batch>``, deleting the folded partitions — after
    a year of micro-batches the per-batch layout is thousands of tiny
    files, the read-amplification trap every other index here
    compacts away. Run while the stream is DOWN (the standard
    maintenance window for its sibling compact()s).

    Replay safety: an ORPHANED partition — batch_id greater than the
    marker, left by a crash between the fingerprint append and the
    marker write — is deliberately left untouched: folding it into a
    committed partition would poison that batch's replay (the
    re-trim's ``batch_id < N`` filter would suddenly see the batch's
    own fingerprints as corpus). Replays of committed batches are
    blocked by the marker guard, so moving their fingerprints to the
    newest committed id never changes any future or replayed trim."""
    from ..functions.ann_index import _recover_swap, _swap_dir

    last = _read_last_batch(spark, path)
    if last < 0:
        return  # nothing committed yet
    # a compaction that crashed MID-WRITE leaves a partial
    # wins.save.tmp; the writes below overwrite only their OWN
    # batch_id=* subdirectories, so stale sibling partitions from the
    # failed attempt would ride into the swapped-in layout — harmless
    # for trims (fingerprints only accumulate) but permanent
    # duplicate rows re-folded on every future compaction. Clear it.
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(path).getFileSystem(sc._jsc.hadoopConfiguration())
    tmp = hp(os.path.join(path, "wins.save.tmp"))
    if fs.exists(tmp) and not fs.delete(tmp, True):
        raise RuntimeError(
            f"compact: could not clear stale {path}/wins.save.tmp from a "
            f"crashed compaction; remove it and retry"
        )
    # a crash between a previous compaction's two renames leaves the
    # index only in wins.old — restore before the read, matching
    # _substr_fold and SubstrDedupIndex.load (this maintenance entry
    # point must not be the one reader that fails on the crash window)
    _recover_swap(spark, path, "wins")
    wins_dir = os.path.join(path, "wins")
    cur = spark.read.parquet(wins_dir)
    committed = cur.where(F.col("batch_id") <= int(last))
    n_parts = committed.rdd.getNumPartitions()
    committed.select("fp").distinct().coalesce(
        max(1, n_parts // 8)
    ).write.mode("overwrite").parquet(
        os.path.join(path, f"wins.save.tmp/batch_id={int(last)}")
    )
    # orphaned partitions (> last) ride along into the new layout
    # untouched so a pending replay still sees exactly its own append
    orphans = [
        r["batch_id"]
        for r in cur.select("batch_id").distinct().collect()
        if int(r["batch_id"]) > int(last)
    ]
    for b in orphans:
        spark.read.parquet(
            os.path.join(wins_dir, f"batch_id={int(b)}")
        ).write.mode("overwrite").parquet(
            os.path.join(path, f"wins.save.tmp/batch_id={int(b)}")
        )
    # if the index carries a save-consistency token (a batch-saved
    # index a stream took over), preserve it across the semantic
    # no-op — the meta sidecar is untouched and still echoes it
    from ..functions.ann_index import _read_token, _stamp_token

    tok = _read_token(spark, wins_dir)
    if tok is not None:
        _stamp_token(spark, os.path.join(path, "wins.save.tmp"), tok)
    _swap_dir(spark, path, "wins")


def _substr_fold(
    path: str,
    out_path: str,
    id_col: str,
    text_col: str,
    k: int,
    min_count: int,
):
    """The per-batch fold — exposed so tests can drive replay
    semantics directly."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.dedup_index import SubstrDedupIndex

        spark = batch_df.sparkSession
        if batch_id <= _read_last_batch(spark, path):
            return  # crash-replay of a fully-applied batch
        wins_dir = os.path.join(path, "wins")
        meta_dir = os.path.join(path, "meta")
        # a crash between compact_substr_stream's two renames leaves
        # the index only in wins.old; restore it BEFORE the existence
        # probe or this fold would trim against an empty corpus and
        # the next swap's entry guard would delete the only copy
        # (the ADVICE-r10 sketch-fold lesson, same shape)
        from ..functions.ann_index import _recover_swap

        _recover_swap(spark, path, "wins")
        if _path_exists(spark, meta_dir):
            meta = spark.read.parquet(meta_dir).head()
            if int(meta["k"]) != int(k):
                raise ValueError(
                    f"substr stream k={k} against an index built with "
                    f"k={int(meta['k'])} — window spaces are disjoint, "
                    f"the trim would silently never match"
                )
        else:
            spark.createDataFrame([(int(k),)], "k int").coalesce(
                1
            ).write.mode("overwrite").parquet(meta_dir)
        if _path_exists(spark, wins_dir):
            # the decisive filter: a replayed batch must not see its
            # own (possibly already-appended) fingerprints as corpus
            wins = (
                spark.read.parquet(wins_dir)
                .where(F.col("batch_id") < int(batch_id))
                .select("fp")
            )
        else:
            wins = spark.createDataFrame([], "fp bigint")
        idx = SubstrDedupIndex(spark, wins, k=k)
        trimmed = idx.trim(
            batch_df, id_col=id_col, text_col=text_col,
            min_count=min_count,
        ).persist()  # two consumers: the row sink + the fp append
        trimmed.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={int(batch_id)}")
        )
        SubstrDedupIndex._fp_frame(
            trimmed.select(F.col("clean_text").alias(text_col)),
            text_col,
            k,
        ).write.mode("overwrite").parquet(
            os.path.join(wins_dir, f"batch_id={int(batch_id)}")
        )
        trimmed.unpersist(False)
        # trim() persists the tokenized batch (track_persisted
        # contract); a long-running stream would leak one cached
        # frame per micro-batch without this release
        from ..functions._cache import unpersist_intermediates

        unpersist_intermediates(trimmed)
        _write_last_batch(spark, path, batch_id)

    return _fold

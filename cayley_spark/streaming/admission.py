"""Streaming corpus admission — the writeStream face of
``functions.pipeline.admit_corpus_batch`` (the COMPOSED admission
chain: fused quality gates → ExactSubstr trim against the persisted
window-fingerprint index → within-batch MinHash dedup → cross-corpus
LSH admission from the persisted signature index → benchmark
decontamination → index appends). ``streaming/substr.py`` streams
the substring stage alone; this module streams the whole daily-batch
pipeline, so a crawl-delivery directory (e.g. WET segments parsed by
``sources.warc.read_wet_stream`` + ``wet_to_documents``) feeds the
corpus continuously and every admitted batch immediately gates the
next one.

Exactly-once discipline (the repo's batch-id pattern, adapted to the
admission quirk that makes naive replay DESTRUCTIVE — once a batch's
windows are appended, re-admitting the same rows returns EMPTY by
design, so a crash-replay that re-ran the pipeline would overwrite
the batch's durable output with nothing):

- the ``last_batch`` marker (written LAST) makes committed batches
  skip;
- inside a batch, ``admit_corpus_batch(durable_out=...)`` writes the
  admitted rows to ``{out_path}/batch_id=N`` BEFORE any index
  append, so the only possible crash windows are (a) before the
  durable write completed — no appends happened, full re-run is
  correct — and (b) after it — detected by the write's ``_SUCCESS``
  marker, recovered by RE-APPENDING the saved rows to both indexes
  with ``if_absent=True`` (exactly idempotent: only rows the crashed
  append did not land are written — a PLAIN re-append would be
  storage-harmless for the fingerprint index but could double-count
  LSH signature rows against the hot-bucket occupancy cap and flip
  near-dup rejections into admissions until ``compact()``).

Both indexes must exist at their paths (build them from the
historical corpus with ``SubstrDedupIndex.build(...).save(path)`` /
``LSHDedupIndex.build(...).save(path)``; an empty corpus works).
Run the index ``compact()``s in the stream's maintenance windows —
every micro-batch appends one file set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .sketches import _path_exists, _read_last_batch, _write_last_batch


def _admit_fold(
    substr_path: str,
    lsh_path: str,
    out_path: str,
    benchmark,
    id_col: str,
    text_col: str,
    source_col,
    params: dict,
):
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.dedup_index import (
            LSHDedupIndex,
            SubstrDedupIndex,
        )
        from ..functions.pipeline import admit_corpus_batch

        spark = batch_df.sparkSession
        # the marker lives under an underscore-prefixed dir so Spark's
        # hidden-path filter skips it and spark.read.parquet(out_path)
        # reads the admitted corpus as ONE batch_id-partitioned dataset
        marker_base = os.path.join(out_path, "_admission")
        if batch_id <= _read_last_batch(spark, marker_base):
            return  # committed batch replay: everything already done
        out_dir = os.path.join(out_path, f"batch_id={batch_id}")
        sidx = SubstrDedupIndex.load(spark, substr_path)
        lidx = LSHDedupIndex.load(spark, lsh_path)
        if _path_exists(spark, os.path.join(out_dir, "_SUCCESS")):
            # crash window (b): the batch's rows are durable but the
            # marker never landed — the appends may or may not have
            # happened. Recover by re-appending the SAVED rows with
            # if_absent=True (exactly idempotent); re-running
            # admission here would see the batch's own windows in the
            # index and overwrite the durable output with an empty
            # frame, and a PLAIN re-append would double-count sig
            # rows against the hot-bucket occupancy cap.
            saved = spark.read.parquet(out_dir)
            appendable = saved.selectExpr(
                id_col, f"clean_text as {text_col}"
            )
            sidx.append(appendable, text_col=text_col, if_absent=True)
            lidx.append(
                appendable, id_col=id_col, text_col=text_col,
                if_absent=True,
            )
        else:
            admit_corpus_batch(
                batch_df,
                sidx,
                lidx,
                benchmark,
                id_col=id_col,
                text_col=text_col,
                source_col=source_col,
                num_hashes=lidx.num_hashes,
                bands=lidx.bands,
                minhash_k=lidx.k,
                update_indexes=True,
                durable_out=out_dir,
                **params,
            )
        _write_last_batch(spark, marker_base, batch_id)

    return fold


def admit_corpus_stream(
    docs: DataFrame,
    substr_path: str,
    lsh_path: str,
    out_path: str,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    **params,
):
    """foreachBatch writer running the composed incremental admission
    per micro-batch against the persisted indexes at ``substr_path``
    / ``lsh_path``; admitted rows land under
    ``{out_path}/batch_id=N``. Returns the writer — the caller picks
    trigger/checkpoint and starts it. Extra keyword arguments pass
    through to :func:`admit_corpus_batch` (gate thresholds,
    jaccard_threshold, contam_n, ...); the LSH geometry always
    follows the index's own saved parameters — passing ``num_hashes``
    / ``bands`` / ``minhash_k`` here is rejected UP FRONT (it would
    otherwise surface only as a duplicate-kwarg TypeError at the
    first micro-batch, long after ``start()``)."""
    reserved = {"num_hashes", "bands", "minhash_k"} & params.keys()
    if reserved:
        raise ValueError(
            "admit_corpus_stream: LSH geometry always follows the "
            "saved index's own parameters — remove "
            f"{sorted(reserved)} (set geometry when BUILDING the "
            "index at lsh_path)"
        )
    return docs.writeStream.foreachBatch(
        _admit_fold(
            substr_path, lsh_path, out_path, benchmark,
            id_col, text_col, source_col, params,
        )
    )

"""Streaming ANN-index maintenance — the similarity-search member of
the streaming maintenance FAMILY (sketches: Count-Min / bloom / KMV;
dedup: the LSH admission chain): a persisted ``IVFIndex`` stays fresh
as an embedding stream arrives, without ever rebuilding.

Per micro-batch (``foreachBatch``): arrivals are assigned to the
index's FROZEN centroid set and appended as delta-sized file sets
into their inverted-list partitions (``IVFIndex.add(path=...)`` — the
``GraphStore.save_deltas`` discipline: pre-existing bucket files stay
byte-identical, only touched buckets gain files). State lives in the
parquet artifact, not the state store — zero per-key streaming state,
no watermark, no eviction contract; per-batch cost is the batch's own
assignment scan plus delta-sized writes, never O(index).

Exactly-once: the batch-id marker (the sketch folds' sidecar) makes a
committed batch's replay a no-op. The one crash window — append
landed, marker write did not — re-appends the batch on replay:

- default (``if_absent=False``): the replayed rows land twice. This
  is the SAFE direction for an ANN index (no vector is ever lost;
  recall is unaffected; a duplicate can at worst occupy two top-k
  slots until ``IVFIndex.compact``) — the same reasoning as the
  Count-Min fold's over-count window.
- ``if_absent=True``: the fold anti-joins the batch's ids against the
  inverted lists it is about to touch (partition-pruned id projection
  — never a full-index scan) and appends only rows the crashed append
  did not land — EXACTLY idempotent, the ``LSHDedupIndex.append``
  contract, at the cost of that pruned id scan per batch.

Standard IVF caveats ride through from ``IVFIndex.add``: centroids
are not retrained (monitor ``bucket_counts`` and rebuild on drift),
and id uniqueness across batches is the caller's contract (with
``if_absent=True`` a re-sent id is dropped rather than duplicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sketches import _read_last_batch, _write_last_batch


def ivf_stream(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    if_absent: bool = False,
):
    """foreachBatch writer maintaining the saved ``IVFIndex`` at
    ``path`` over a streaming frame of ``(id_col, vec_col)`` rows.
    The index must already exist (``IVFIndex.build(...).save(path)``)
    — centroids and geometry always follow the saved artifact, like
    every streaming fold in this family. Returns the writer; the
    caller picks trigger/checkpoint and starts it."""
    return vectors.writeStream.foreachBatch(
        _ivf_fold(path, id_col, vec_col, if_absent)
    )


def _ivf_fold(path: str, id_col: str, vec_col: str, if_absent: bool):
    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.ann_index import IVFIndex, _nearest

        spark = batch_df.sparkSession
        if batch_id <= _read_last_batch(spark, path):
            return
        idx = IVFIndex.load(spark, path)
        delta = batch_df.select(id_col, vec_col)
        if if_absent:
            # prune the id probe to the buckets this batch touches:
            # assignment is a map-only pass over the batch, and the
            # touched-c list is bounded by n_centroids
            assigned = delta.withColumn(
                "__c", _nearest(F.col(vec_col).cast("array<double>"), idx.centroids)
            )
            touched = [
                r["__c"]
                for r in assigned.select("__c").distinct().collect()
            ]
            existing = idx.bucketed.where(
                F.col("c").isin(touched)
            ).select(F.col("id").alias("__seen"))
            delta = (
                assigned.join(
                    existing,
                    assigned[id_col] == existing["__seen"],
                    "left_anti",
                )
                .drop("__c")
            )
        idx.add(delta, path=path, id_col=id_col, vec_col=vec_col)
        _write_last_batch(spark, path, batch_id)

    return _fold

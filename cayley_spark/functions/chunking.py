"""Document chunking and sequence packing — the two structural
transforms between a cleaned corpus and a training batch.

- ``chunk_documents``: split every document into fixed-size,
  optionally overlapping character windows (the retrieval-index /
  long-doc-truncation primitive). Pure JVM expressions: a
  ``sequence`` of chunk starts, ``transform`` + ``posexplode`` —
  scan-speed, no shuffle, no Python.
- ``pack_sequences``: assign documents to fixed-token-budget training
  bins by the concat-then-slice rule used in pretraining pipelines:
  lay documents end to end in a deterministic order and cut every
  ``budget`` tokens; a document's bin is its starting offset div
  budget. The global running sum is computed as a DISTRIBUTED prefix
  sum — range-partition on the order key, cumsum within each
  partition, then add each partition's starting offset (a
  numPartitions-sized driver exchange) — never as a
  single-partition global window, which is the classic
  Window.orderBy()-without-partitionBy scale trap. The order key
  makes the packing reproducible across engines and runs (greedy
  bin-packing heuristics are not).

Everything is integer arithmetic, so the DuckDB oracles hash-match
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import token_count


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into windows of ``chunk_chars`` characters
    starting every ``chunk_chars - overlap`` characters (the final
    window may be shorter). Empty documents produce no chunks.
    Returns (id, chunk_idx, chunk_text)."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("need 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    c = F.col(text_col)
    n = F.length(c)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), F.floor((n - 1) / F.lit(stride)))
    ).otherwise(F.array().cast("array<bigint>"))
    chunks = F.transform(
        starts, lambda i: F.substring(c, (i * stride + 1).cast("int"), chunk_chars)
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
) -> DataFrame:
    """Concat-then-slice packing: documents are laid end to end in
    ``order_col`` order (default: the id — MUST be unique, ties would
    make offsets placement-dependent), and training bin k owns stream
    tokens [k*budget, (k+1)*budget). A document's bin is where it
    STARTS; ``offset`` is its token offset within the stream, from
    which a loader can compute any straddling. Returns
    (id, n_tokens, offset, bin)."""
    from pyspark.sql.window import Window

    order = order_col or id_col
    base = df.select(
        F.col(id_col),
        F.col(order).alias("__ord"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    # distributed prefix sum: disjoint ordered ranges per partition,
    # local cumsum, plus the sum of all earlier partitions
    # localCheckpoint pins one placement: the range boundaries are
    # sample-based, so the totals job and the output job must not
    # re-run the shuffle independently
    ranged = (
        base.repartitionByRange("__ord")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("__pid").orderBy("__ord").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = ranged.withColumn(
        "__local", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    totals = sorted(
        (r["__pid"], r["t"])
        for r in ranged.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    run = 0
    offsets = []
    for pid, t in totals:
        offsets.append((pid, run))
        run += t
    off_df = F.broadcast(
        local.sparkSession.createDataFrame(
            offsets, "__pid: int, __base: long"
        )
    )
    return (
        local.join(off_df, "__pid")
        .select(
            id_col,
            "n_tokens",
            (F.col("__base") + F.col("__local")).alias("offset"),
        )
        .withColumn("bin", F.expr(f"offset div {budget}"))
    )

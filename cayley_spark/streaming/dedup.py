"""Streaming deduplication — the incremental twin of the batch exact
dedup operator (functions/dedup.exact_duplicate_groups).

An ingest pipeline sees re-crawls and re-deliveries continuously;
deduping them at ingest time is cheaper than a periodic batch sweep
over the accumulated corpus. Built on the engine's own
``dropDuplicatesWithinWatermark`` state-store operator: exact-dup
state is partitioned by the content key and EXPIRES once the
watermark passes. The guarantee is one-directional (the engine's
own contract): a duplicate arriving within the watermark horizon is
DEFINITELY dropped; one arriving after the horizon is admitted again
once state eviction runs — eviction lags one micro-batch behind the
watermark advance, so a duplicate landing in exactly that batch may
still be dropped. Bounded state buys a bounded dedup window; the
periodic batch sweep stays the backstop for long-range duplicates.

Keying on ``md5(text)`` instead of the raw text keeps the state
store at ~32 bytes/entry regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop exact-content duplicates within the watermark horizon.
    Works on both streaming inputs (stateful, bounded state) and
    batch inputs (plain dropDuplicates on the content hash — same
    rows kept when each content value appears once per horizon).

    Returns the input rows (plus nothing — the hash column is
    internal) with later duplicates removed; of concurrent
    duplicates, which single row survives is engine-chosen, same as
    batch ``dropDuplicates``.
    """
    keyed = docs.withColumn("__h", F.md5(F.col(text_col)))
    if docs.isStreaming:
        out = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__h"]
        )
    else:
        out = keyed.dropDuplicates(["__h"])
    return out.drop("__h")


def url_dedup_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    url_col: str = "url",
    ts_col: str = "ts",
) -> DataFrame:
    """Crawl-frontier URL dedup at ingest: drop rows whose CANONICAL
    URL (functions/text.canonicalize_url — case/port/tracking-param/
    %-hex/param-order aliasing collapsed) was already seen within the
    watermark horizon. The streaming twin of functions/text.url_dedup,
    and the cheapest admission gate a crawl pipeline has — it runs
    before any text is fetched into state.

    Same engine-native shape as :func:`dedup_stream`: canonicalize at
    scan speed, then ``dropDuplicatesWithinWatermark`` keyed on
    ``md5(canon)`` (fixed 32-byte state entries regardless of URL
    length). Batch inputs take plain dropDuplicates on the same key.
    The horizon guarantee is the engine's own (see dedup_stream)."""
    from ..functions.text import canonicalize_url

    keyed = docs.withColumn(
        "__h", F.md5(canonicalize_url(F.col(url_col)))
    )
    if docs.isStreaming:
        out = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__h"]
        )
    else:
        out = keyed.dropDuplicates(["__h"])
    return out.drop("__h")


def bloom_admission_stream(
    docs: DataFrame,
    bloom: DataFrame,
    key=None,
    n_bits: int | None = None,
    k: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus admission gate at ingest: drop rows whose key is
    maybe-member of a PRE-BUILT bloom over the historical corpus
    (functions/bloom.bloom_build, run as a batch job over the 100-TB
    store once; incrementally extendable by re-building daily).

    STATELESS, unlike the within-stream dedup above: the packed words
    arrive as a one-row broadcast and every micro-batch row evaluates
    pure column expressions — no state store, no watermark, no
    eviction contract. The trade is the bloom's: a maybe-member is
    dropped even if it is a false positive (rate bounded by n_bits/k
    sizing, chosen by the caller), and a true member is ALWAYS
    dropped — no false negatives, ever. Works identically on batch
    inputs (same expressions), which is what the batch-twin test
    exploits.

    ``key`` defaults to ``md5(coalesce(text, ''))`` — the exact-dup
    content key. Pass any Column for URL- or fingerprint-keyed gates.
    """
    from ..functions.bloom import bloom_probe

    if key is None:
        key = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    probed = bloom_probe(docs, bloom, key, n_bits=n_bits, k=k,
                         out_col="__maybe")
    return probed.where(~F.col("__maybe")).drop("__maybe")

"""End-to-end training-corpus pipeline composition.

Every stage here is an operator this repo certifies in isolation
(language ID, Gopher/C4 quality rules, paragraph / ExactSubstr /
MinHash dedup, benchmark decontamination, temperature source mixing,
deterministic export sharding — the standard web-corpus recipe, cf.
Rae et al. 2021 §A1, Raffel et al. 2020 §2.2, Lee et al. 2022,
Penedo et al. 2023 §3). What a training-data team actually runs is
their COMPOSITION over one corpus, and composition is where column
contracts, persist/unpersist discipline, and redundant re-scans go
wrong; :func:`corpus_pipeline` wires the chain once, with the shape
pinned by tests (the raw corpus is scanned ONCE — all scan-speed
filters fuse into that pass and every later stage reads the persisted
survivor frame or its descendants).

Scale shape (100 TB):

- stage 1 (language ID + Gopher + C4) is pure column expressions
  fused into the ONE raw-corpus scan; the survivor frame (id,
  source, cleaned text) persists and is the only thing downstream
  stages touch — raw text is never re-read;
- the dedup stages keep their certified no-pair-join shapes
  (paragraph digests shuffle, ExactSubstr windows ride one analytic
  shuffle with the hot-key guard, MinHash moves ids+signatures
  only);
- decontamination broadcasts the benchmark n-gram set;
- mixing/sharding are a broadcast rate join + scan-speed hash
  expressions;
- the single metadata join-back (restoring ``source`` onto the
  dedup survivors) is id-keyed on uniform keys — the text stages
  shed metadata columns so their shuffles move tokens, not payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._cache import track_persisted
from .dedup import (
    benchmark_contamination,
    dedup_corpus,
    exact_substr_dedup,
)
from .sampling import export_shards, source_mixture
from .text import (
    GOPHER_STOPLIST,
    paragraph_dedup,
    quality_gate_struct,
)


def corpus_pipeline(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang: str = "en",
    gopher_min_words: int = 50,
    gopher_stoplist: tuple = GOPHER_STOPLIST,
    c4_min_words_per_line: int = 5,
    c4_min_sentences: int = 3,
    para_max_df: int = 1,
    substr_k: int = 50,
    substr_min_count: int = 2,
    minhash_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    contam_n: int = 5,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    n_shards: int = 16,
    shard_salt: str = "",
) -> DataFrame:
    """Compose the full corpus-preparation chain and return the
    training-ready survivors as (id, source, shard, sort_key,
    clean_text):

    1. **language ID** — keep docs :func:`language_guess` labels
       ``lang``;
    2. **Gopher rules** — keep docs passing the full rule battery
       (:func:`gopher_pass`);
    3. **C4 cleaning** — keep docs passing ``keep_c4`` and continue
       with the line-cleaned text (:func:`c4_keep` /
       :func:`c4_clean`); stages 1-3 are one fused scan, and the
       survivor frame persists (downstream stages consume it, never
       the raw corpus);
    4. **paragraph dedup** — drop all copies of paragraphs (newline-
       separated lines of the C4-cleaned text) in > ``para_max_df``
       distinct docs (:func:`paragraph_dedup`, the C4/RefinedWeb
       boilerplate rule);
    5. **ExactSubstr dedup** — keep-one removal of ``substr_k``-token
       verbatim windows (:func:`exact_substr_dedup`, Lee et al.
       2022); docs trimmed to empty are dropped;
    6. **MinHash near-dup removal** — LSH → exact-Jaccard verify →
       cluster → keep the min-id representative
       (:func:`dedup_corpus`);
    7. **decontamination** — drop docs sharing any ``contam_n``-gram
       with ``benchmark`` (:func:`benchmark_contamination`; skipped
       when ``benchmark`` is None);
    8. **source mixing** — temperature re-weighting
       (:func:`source_mixture`: rate ∝ n^alpha over the SURVIVING
       per-source counts, content-hash keep decisions);
    9. **export shards** — deterministic (shard, sort_key)
       assignment (:func:`export_shards(keep=True)`).

    Intermediates persisted by this call or its stage operators are
    tracked on the result — release them with
    :func:`cayley_spark.functions._cache.unpersist_intermediates`
    after materializing.
    """
    # one fused gate struct instead of four stacked gate expressions:
    # Catalyst inlines the text into every predicate reference with no
    # cross-reference CSE, so the stacked form re-tokenized 25x per
    # row (quality_gate_struct docstring; 3x faster scan at sf0.1,
    # identical results pinned by tests)
    gate = quality_gate_struct(
        F.col(text_col),
        lang=lang,
        min_words=gopher_min_words,
        stoplist=gopher_stoplist,
        min_words_per_line=c4_min_words_per_line,
        min_sentences=c4_min_sentences,
    )
    filtered = (
        docs.where(gate.getField("keep"))
        .select(
            F.col(id_col),
            F.col(source_col),
            gate.getField("clean").alias(text_col),
        )
        .persist()
    )
    para = paragraph_dedup(
        filtered.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        max_df=para_max_df,
        sep_re=r"\n+",
        joiner="\n",
    )
    sub = exact_substr_dedup(
        para.select(
            F.col(id_col), F.col("clean_text").alias(text_col)
        ),
        id_col=id_col,
        text_col=text_col,
        k=substr_k,
        min_count=substr_min_count,
    )
    sub_handles = getattr(sub, "_cayley_persisted", ())
    # persisted: dedup_corpus references its input twice (signature
    # build + the final keep-representative semi-join), and each
    # reference would otherwise re-run the ExactSubstr trim tail
    # (measured -24% wall on the composed entry at sf0.1)
    nonempty = sub.where(F.col("clean_text") != "").select(
        F.col(id_col), F.col("clean_text").alias(text_col)
    ).persist()
    deduped = dedup_corpus(
        nonempty,
        id_col=id_col,
        text_col=text_col,
        k=minhash_k,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    dedup_handles = getattr(deduped, "_cayley_persisted", ())
    if benchmark is not None:
        contaminated = benchmark_contamination(
            deduped, benchmark, id_col=id_col, text_col=text_col,
            n=contam_n,
        ).select(id_col)
        clean = deduped.join(contaminated, id_col, "left_anti")
    else:
        clean = deduped
    # restore the metadata the text stages shed (one id-keyed join on
    # uniform keys; the alternative — threading `source` through every
    # token shuffle — moves payload columns through the dedup stages).
    # Persisted: source_mixture references its input three times
    # (per-source counts, their totals, and the hash-filter join) —
    # without this the decontamination anti-join and this restore
    # join would re-execute per reference (and the benchmark n-gram
    # derivation with them, measured as 3 raw benchmark scans in the
    # optimized plan; pinned in tests/test_plans.py).
    with_src = clean.join(
        filtered.select(id_col, source_col), id_col
    ).persist()
    mixed = source_mixture(
        with_src,
        source_col=source_col,
        alpha=alpha,
        target_frac=target_frac,
        text_col=text_col,
    )
    out = export_shards(
        mixed, id_col=id_col, n_shards=n_shards, salt=shard_salt,
        keep=True,
    ).select(
        F.col(id_col),
        F.col(source_col),
        "shard",
        "sort_key",
        F.col(text_col).alias("clean_text"),
    )
    return track_persisted(
        out, filtered, nonempty, with_src, *sub_handles,
        *dedup_handles,
    )


def admit_corpus_batch(
    batch: DataFrame,
    substr_index,
    lsh_index,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    lang: str = "en",
    gopher_min_words: int = 50,
    gopher_stoplist: tuple = GOPHER_STOPLIST,
    c4_min_words_per_line: int = 5,
    c4_min_sentences: int = 3,
    substr_min_count: int = 2,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = 256,
    contam_n: int = 5,
    minhash_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    update_indexes: bool = True,
    durable_out: str | None = None,
) -> DataFrame:
    """Admit one crawl batch against a persisted corpus — the
    INCREMENTAL form of :func:`corpus_pipeline` (the daily-batch
    pattern: yesterday's corpus lives in the two persisted indexes,
    today's batch never re-reads corpus text):

    1. **quality gates** — language ID + Gopher + C4, fused into one
       batch scan exactly as in the batch pipeline;
    2. **ExactSubstr admission** — ``substr_index.trim``: every
       window the corpus already holds is removed from all its batch
       occurrences, windows fresh to the batch get the within-batch
       keep-one rule; docs trimmed to empty are dropped;
    3. **within-batch near-dup removal** — :func:`dedup_corpus` on
       the trimmed batch (the cross-corpus pass below only sees
       corpus-vs-batch pairs);
    4. **cross-corpus near-dup admission** — ``lsh_index.dedup``:
       exact digests and verified LSH near-dups of indexed docs are
       dropped, corpus signatures read from files;
    5. **decontamination** — drop docs sharing any ``contam_n``-gram
       with ``benchmark`` (skipped when None);
    6. **index maintenance** (``update_indexes=True``) — the
       survivors' windows and signatures APPEND to both indexes, so
       tomorrow's batch sees today's admissions; the survivor frame
       is materialized FIRST, because the returned plan's anti-joins
       read the index files and would otherwise match the batch
       against its own just-appended rows on a later
       materialization.

    **Durability (``durable_out``).** The two appends are not atomic
    with each other or with the caller's output write, and admission
    is NOT re-runnable after an append: every admitted window is now
    indexed, so re-running the same batch returns empty by design.
    With ``durable_out=None`` the survivors are only a
    ``localCheckpoint`` (executor-local, non-reliable) while the
    appends run — a crash after the appends but before the caller
    persists the result LOSES the batch permanently. Pass
    ``durable_out=<path>`` (the CLI default) to close the window: the
    survivor frame is written to that parquet path BEFORE any append,
    the appends source from the re-read files, and the re-read frame
    is returned. Crash recovery is then mechanical — re-append the
    saved output to both indexes with ``if_absent=True``
    (``SubstrDedupIndex.append`` + ``LSHDedupIndex.append`` on the
    parquet at ``durable_out``), which writes only the rows the
    crashed append did not land and is therefore exactly idempotent
    even when it repeats an append that DID land before the crash.
    (A PLAIN re-append is storage-harmless for window fingerprints —
    every probe is a semi/anti-join — but duplicate LSH signature
    rows double-count against the hot-bucket occupancy cap and can
    flip near-dup rejections into admissions until ``compact()``
    squeezes them; ``if_absent=True`` avoids the question.)

    Returns the admitted rows as (id[, source], clean_text).
    Paragraph-level boilerplate, mixture rates, and shard assignment
    are corpus-GLOBAL decisions (document frequency over the whole
    corpus, per-source totals) — they belong to the batch pipeline /
    offline compaction, not the admission path.

    Scale shape: one batch scan for the gates; trim and dedup keep
    their certified shapes (fingerprint semi/anti-joins on 8-byte
    keys, banded signature joins with the hot-bucket guard — corpus
    TEXT is never read); appends are file writes of batch-sized
    frames. ``update_indexes=True`` eagerly materializes the
    (batch-sized) result via localCheckpoint before appending."""
    meta_cols = [F.col(id_col)] + (
        [F.col(source_col)] if source_col else []
    )
    # fused gate struct, exactly as in corpus_pipeline (see the
    # comment there and quality_gate_struct's docstring)
    gate = quality_gate_struct(
        F.col(text_col),
        lang=lang,
        min_words=gopher_min_words,
        stoplist=gopher_stoplist,
        min_words_per_line=c4_min_words_per_line,
        min_sentences=c4_min_sentences,
    )
    filtered = (
        batch.where(gate.getField("keep"))
        .select(
            *meta_cols,
            gate.getField("clean").alias(text_col),
        )
        .persist()
    )
    trimmed = substr_index.trim(
        filtered.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        min_count=substr_min_count,
    )
    trim_handles = getattr(trimmed, "_cayley_persisted", ())
    # persisted for the same dual-reference reason as the batch
    # pipeline's nonempty frame
    nonempty = trimmed.where(F.col("clean_text") != "").select(
        F.col(id_col), F.col("clean_text").alias(text_col)
    ).persist()
    # persisted: the cross-corpus stage references the within-batch
    # survivors twice (signature build + its final anti-join) and the
    # decontamination/source tail references `cross` up to three more
    # times — without these persists every reference re-executes the
    # whole within-batch LSH -> verify -> cluster chain from
    # `nonempty`. At bench scale the re-execution largely rides the
    # stage operators' internal persists, so isolated wall is
    # neutral-to-slightly-better (mins 7.6-9.3 s vs 9.0-10.6 s across
    # noisy reps at sf0.1); the claim is PLAN SHAPE at 100 TB, where
    # a re-executed clustering loop is a recompute, not a cache hit
    within = dedup_corpus(
        nonempty,
        id_col=id_col,
        text_col=text_col,
        k=minhash_k,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
    ).persist()
    within_handles = getattr(within, "_cayley_persisted", ())
    cross = lsh_index.dedup(
        within,
        id_col=id_col,
        text_col=text_col,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
    ).persist()
    cross_handles = getattr(cross, "_cayley_persisted", ())
    if benchmark is not None:
        contaminated = benchmark_contamination(
            cross, benchmark, id_col=id_col, text_col=text_col,
            n=contam_n,
        ).select(id_col)
        clean = cross.join(contaminated, id_col, "left_anti")
    else:
        clean = cross
    if source_col:
        clean = clean.join(filtered.select(id_col, source_col), id_col)
    out = clean.select(
        *meta_cols, F.col(text_col).alias("clean_text")
    )
    handles = (
        filtered, nonempty, within, cross, *trim_handles,
        *within_handles, *cross_handles,
    )
    if not update_indexes and durable_out is None:
        return track_persisted(out, *handles)
    # materialize BEFORE the appends: the plan's anti-joins scan the
    # index parquet paths, and append() extends those files — a later
    # re-materialization would see the batch's own rows in the corpus
    # side and drop everything. durable_out materializes through a
    # RELIABLE parquet write (survivors outlive a crash mid-append;
    # see the durability note above); localCheckpoint is the
    # caller-managed-durability fallback.
    from ._cache import unpersist_intermediates

    if durable_out is not None:
        out.write.mode("overwrite").parquet(durable_out)
        unpersist_intermediates(track_persisted(out, *handles))
        out = batch.sparkSession.read.parquet(durable_out)
    else:
        out = out.localCheckpoint(eager=True)
        unpersist_intermediates(track_persisted(out, *handles))
    if not update_indexes:
        return out
    appendable = out.select(
        F.col(id_col), F.col("clean_text").alias(text_col)
    )
    substr_index.append(appendable, text_col=text_col)
    lsh_index.append(appendable, id_col=id_col, text_col=text_col)
    return out

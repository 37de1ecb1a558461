"""Deterministic corpus splitting/sampling.

A training-data pipeline needs splits that are (a) reproducible
across runs and engines, (b) content-addressed (a re-crawled copy of
a page lands in the same split, so held-out data stays held out even
across dedup changes), and (c) computable at scan speed. Hashing the
CONTENT and bucketing on the digest gives all three; this is the
standard held-out-split construction for web-scale corpora.

Everything here is a pure column expression over md5 hex — portable
to any engine (the DuckDB oracle reproduces the split byte-for-byte),
partition-local, zero shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(col: Column, buckets: int = 16) -> Column:
    """Deterministic bucket in [0, buckets): the first 8 hex chars of
    md5(content) as an int, mod buckets. 32 bits of hash is plenty for
    split assignment (collisions only shift bucket sizes, never
    reproducibility). NULL content hashes as the empty string — a
    NULL md5 would otherwise silently pin such rows to the
    ``otherwise`` branch of every split rule."""
    h = F.conv(
        F.substring(F.md5(F.coalesce(col, F.lit(""))), 1, 8), 16, 10
    ).cast("long")
    return (h % buckets).cast("int")


def hash_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    val_buckets: int = 1,
    test_buckets: int = 1,
    buckets: int = 16,
) -> DataFrame:
    """Assign every document to train/val/test by content hash:
    bucket < val_buckets -> 'val', next test_buckets -> 'test', rest
    'train'. Returns (id, bucket, split)."""
    b = hash_bucket(F.col(text_col), buckets)
    split = (
        F.when(b < val_buckets, F.lit("val"))
        .when(b < val_buckets + test_buckets, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.select(
        F.col(id_col), b.alias("bucket"), split.alias("split")
    )


def hash_sample(
    df: DataFrame, text_col: str = "text", rate_denominator: int = 16
) -> DataFrame:
    """Deterministic ~1/denominator content sample: keep rows whose
    hash bucket is 0. Same rows on every run and engine."""
    return df.where(hash_bucket(F.col(text_col), rate_denominator) == 0)


def source_mixture(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    target_frac: float = 0.5,
    text_col: str = "text",
    denominator: int = 1 << 20,
    upsample: bool = False,
) -> DataFrame:
    """Temperature-based source re-weighting — the standard
    multilingual/multi-source mixing rule (sample source s with
    probability ∝ n_s^alpha): alpha=1 keeps natural proportions,
    alpha→0 approaches uniform-over-sources, boosting small sources.

    Deterministic: per-source keep-rates are computed from exact
    counts, and each row is kept iff its content-hash bucket (a
    20-bit uniform rational) falls below its source's rate — the
    same rows survive on every run, engine, and partitioning.
    ``target_frac`` sets the expected kept fraction of the corpus.

    ``upsample=False`` (default): per-source rates are capped at 1 —
    a boosted small source is never oversampled (no-duplication
    convention). ``upsample=True``: rates may exceed 1 and a source
    is replicated past one epoch — the real LLM-recipe behavior
    (the published GPT-3 / Pile mixture weights exceed natural
    proportions for high-quality sources: Brown et al. 2020 table
    2.2, Gao et al. 2020 §1). Each row emits floor(rate) full
    copies, plus one more iff its content-hash bucket falls below
    the fractional remainder — so expected copies = rate, the copy
    decision is content-addressed (same rows replicate on every
    run/engine/partitioning), and the output gains a ``replica``
    INT column (0-based) so downstream stages can tell copies apart.

    Scale shape: one count aggregation on the (low-cardinality)
    source key, rates re-joined via broadcast, then a scan-speed
    hash filter; the upsample path adds only a per-row
    explode(sequence(...)) — still no shuffle of the corpus itself,
    and output size is rate-bounded by construction.
    """
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__n")
    ).withColumn("__w", F.pow(F.col("__n").cast("double"), alpha))
    totals = counts.agg(
        F.sum("__w").alias("__wsum"), F.sum("__n").alias("__total")
    )
    raw_rate = (
        (F.col("__w") / F.col("__wsum"))
        * (F.col("__total").cast("double") * target_frac)
        / F.col("__n")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        F.col(source_col).alias("__src"),
        (
            raw_rate if upsample else F.least(F.lit(1.0), raw_rate)
        ).alias("__rate"),
    )
    # null-safe join: a NULL source is a legitimate group (groupBy
    # counted it, so it carries weight in __wsum/__total) — an
    # equi-join would silently drop its rows while still depressing
    # every other source's keep-rate
    joined = df.join(
        F.broadcast(rates),
        F.col(source_col).eqNullSafe(F.col("__src")),
    )
    bucket_frac = (
        hash_bucket(F.col(text_col), denominator).cast("double")
        / denominator
    )
    if not upsample:
        return joined.where(bucket_frac < F.col("__rate")).drop(
            "__rate", "__src"
        )
    # integer epochs + content-hash-decided fractional remainder;
    # n_copies >= 1 is filtered BEFORE sequence() (Spark's sequence
    # auto-steps -1 when stop < start, so sequence(0, -1) would emit
    # rows instead of none)
    n_copies = (
        F.floor("__rate")
        + F.when(
            bucket_frac < (F.col("__rate") - F.floor("__rate")),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("int")
    return (
        joined.withColumn("__copies", n_copies)
        .where(F.col("__copies") >= 1)
        .withColumn(
            "replica",
            F.explode(
                F.sequence(F.lit(0), F.col("__copies") - F.lit(1))
            ),
        )
        .drop("__rate", "__src", "__copies")
    )


def shard_key(col: Column, salt: str = "") -> Column:
    """Content-addressed sort key for a deterministic global shuffle:
    md5(salt || value). Reordering a 100 TB corpus for training
    export = repartition by ``shard_of(key)`` + sortWithinPartitions
    on this key — reproducible on every engine, no global sort."""
    return F.md5(F.concat(F.lit(salt), F.coalesce(col.cast("string"), F.lit(""))))


def export_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "",
    keep: bool = False,
) -> DataFrame:
    """Deterministic training-export shard assignment: every row gets
    (shard, sort_key) where shard = hash(id) mod n_shards and
    sort_key orders rows WITHIN a shard — together a reproducible
    global shuffle of the corpus (the pre-training requirement that
    document order be fixed but pseudo-random, decoupled from crawl
    order). The writer pattern is
    ``out.repartition('shard').sortWithinPartitions('sort_key')`` —
    one shuffle, no single global sort task. ``keep=True`` appends
    (shard, sort_key) to the existing columns instead of projecting
    them away — the composed-pipeline form (the assignment stays a
    scan-speed expression either way; a keep-columns variant via
    join-back would shuffle the corpus for nothing). A ``keep=True``
    input that ALREADY carries a ``shard`` or ``sort_key`` column is
    rejected: ``withColumns`` would silently overwrite it, so a double
    application (or a caller's homonymous metadata column) would
    clobber data instead of failing loudly."""
    if keep:
        clash = [c for c in ("shard", "sort_key") if c in df.columns]
        if clash:
            raise ValueError(
                f"export_shards(keep=True): input already has {clash} "
                "column(s); rename them or use keep=False"
            )
    k = shard_key(F.col(id_col), salt)
    shard = (
        F.conv(F.substring(k, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    if keep:
        return df.withColumns({"shard": shard, "sort_key": k})
    return df.select(
        F.col(id_col), shard.alias("shard"), k.alias("sort_key")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    order_col: str,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` rows of
    each stratum with the smallest ``md5(order_col)`` — a content-
    addressed shuffle, so every engine and every run selects the same
    rows (``orderBy(rand())`` samples differently per run and per
    partitioning). One shuffle on the stratum key; per-stratum top-n
    via window row_number, which AQE keeps partial when strata are
    many.

    ``salt_buckets`` selects the TWO-PHASE form — the hot-stratum
    scale path (SCALE.md round-13 audit): the single window
    serializes every row of one stratum into one sorted task, so a
    stratum holding most of a 100 TB corpus becomes a straggler.
    With ``salt_buckets=B``, phase 1 takes the top-n per (stratum,
    xxhash64-salt mod B) — B-way parallel per stratum — and phase 2
    re-ranks only the surviving ≤ B×n rows per stratum. Bit-identical
    for any B: each stratum's true top-n rows are necessarily each
    inside their own salt bucket's top-n (pinned by the equivalence
    test)."""
    from pyspark.sql.window import Window

    h = F.md5(F.col(order_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(order_col))
    if salt_buckets is None:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n_per_stratum)
            .drop("__rn")
        )
    salted = df.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.col(order_col).cast("string")),
            F.lit(int(salt_buckets)),
        ),
    )
    w1 = Window.partitionBy(strata_col, "__salt").orderBy(
        h, F.col(order_col)
    )
    partial = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= n_per_stratum)
        .drop("__rn1", "__salt")
    )
    return (
        partial.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# DSIR: Data Selection with Importance Resampling (Xie et al., NeurIPS
# 2023).  Select raw-corpus documents whose hashed-n-gram profile looks
# like a small TARGET corpus: fit two bag-of-hashed-n-grams categorical
# models (target and raw), score each raw document with the importance
# log-weight sum_b c_b * (log p_target(b) - log p_raw(b)), and resample
# via deterministic Gumbel top-k.  The feature pipeline is the paper's
# (unigrams + bigrams hashed into `buckets` buckets); the hash is the
# repo's portable seeded-md5 family so a SQL oracle replays the
# integer-exact parts (per-doc gram counts against both models)
# bit-for-bit, while the float log-weight itself is pytest-verified.
#
# 100-TB plan: gram explosion is scan-side; the two models are
# groupBy(bucket) counts BOUNDED BY `buckets` rows (default 8192) no
# matter the corpus size, so both model joins broadcast; per-doc
# re-aggregation is one shuffle on doc_id.  Nothing pairs documents
# with each other, so cost is linear in corpus tokens.
# --------------------------------------------------------------------------


def hashed_ngram_buckets(text: Column, buckets: int = 8192) -> Column:
    """array<bigint> of hashed unigram+bigram bucket ids of the
    lowercased \\w+ tokenization (DSIR's feature map). Uses the same
    md5-prefix bucketing as hash_bucket; short/NULL texts yield an
    empty array (the document simply has no mass)."""
    from cayley_spark.functions.text import tokens

    toks = F.coalesce(tokens(text), F.array().cast("array<string>"))
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bi)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ),
    )


def _gram_rows(df: DataFrame, id_col: str, text_col: str, buckets: int):
    return df.select(
        F.col(id_col),
        F.explode(hashed_ngram_buckets(F.col(text_col), buckets)).alias(
            "bucket"
        ),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-raw-document DSIR importance weights against ``target``.

    Returns (id, n_grams, target_freq_sum, raw_freq_sum, logw):
    the integer model-count sums (exact, oracle-replayable) and the
    float log importance weight
        logw = sum_b c_b * ln((t_b + a)/(r_b + a))
               + n_grams * ln((R + aB)/(T + aB))
    with add-a smoothing over B buckets; T/R are total gram counts of
    the target/raw models. Documents with zero grams drop out (no
    evidence either way), matching the oracle's explode semantics."""
    # persisted: the plan references doc THREE times — the raw-model
    # fold below (itself read twice: its total and the join) and the
    # per-doc join — and each reference would re-run the corpus gram
    # explode + groupBy shuffle (r16, measured 3 executions in the
    # before-plan). Bounded by |docs| x min(grams, buckets) rows.
    doc = (
        _gram_rows(raw, id_col, text_col, buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    tgt = (
        _gram_rows(target, id_col, text_col, buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    # the raw model folds out of the per-doc counts — one corpus scan,
    # not two; the re-aggregation input is already bucket-keyed and
    # bounded by |docs|·min(grams, buckets)
    rawm = doc.groupBy("bucket").agg(F.sum("c").alias("rc"))
    # coalesce: SUM over zero rows is NULL, and a NULL total would
    # poison every logw (an empty target is mathematically fine —
    # smoothing carries it: shift = ln((R+aB)/aB))
    totals = tgt.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).alias("__T")
    ).crossJoin(rawm.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("__R")))
    j = (
        doc.join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(rawm), "bucket")
        .crossJoin(F.broadcast(totals))
        .withColumn("tc", F.coalesce(F.col("tc"), F.lit(0)))
    )
    a = F.lit(float(alpha))
    b = F.lit(float(buckets))
    per_gram = F.col("c") * (
        F.log((F.col("tc") + a) / (F.col("rc") + a))
    )
    shift = F.log(
        (F.col("__R").cast("double") + a * b)
        / (F.col("__T").cast("double") + a * b)
    )
    from ._cache import track_persisted

    return track_persisted(
        j.groupBy(id_col).agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("tc")).alias("target_freq_sum"),
            F.sum(F.col("c") * F.col("rc")).alias("raw_freq_sum"),
            (F.sum(per_gram) + F.sum("c") * F.first(shift)).alias("logw"),
        ),
        doc,
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 8192,
    alpha: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel top-k importance RESAMPLING (the paper's §3 step 3):
    keep the k documents with the largest logw + Gumbel(id) where the
    Gumbel noise is derived from md5(seed:id) — deterministic across
    runs, engines, and partitionings.  One TakeOrderedAndProject, no
    global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_weights(raw, target, id_col, text_col, buckets, alpha)
    from ._cache import track_persisted

    return track_persisted(
        w.withColumn(
            "gumbel_key", F.col("logw") + _gumbel(F.col(id_col), seed)
        )
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k),
        *getattr(w, "_cayley_persisted", ()),
    )


def _gumbel(id_col: Column, seed: str) -> Column:
    """Deterministic standard-Gumbel noise from md5(seed:id).

    u in (0,1): 60 md5 bits scaled, clamped BELOW 1.0 — (h+1)/2^60
    can round to exactly 1.0 for h near 2^60 (doubles there are
    spaced 256 apart), and -ln(-ln(1.0)) = +Inf would win a top-k
    slot unconditionally. The clamp value is the largest double < 1."""
    u = F.least(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"{seed}:"), id_col.cast("string"))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(1.0)
        )
        / F.lit(float(1 << 60)),
        F.lit(1.0 - 2.0**-53),
    )
    return -F.log(-F.log(u))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    k rows with the largest ln(weight) + Gumbel(md5(seed:id)) — the
    Gumbel top-k trick, equivalent to Efraimidis & Spirakis 2006
    reservoir keys u^(1/w) in log space, so inclusion probabilities
    follow the weights while the draw is reproducible across runs,
    engines, and partitionings (``orderBy(rand())`` is none of those).
    The pipeline use is quality-weighted corpus subsampling: weight by
    a quality score and the sample leans high-quality without a hard
    cutoff.

    Rows with NULL, zero, or negative weight are excluded (their
    sampling probability is zero/undefined — excluding loudly beats a
    NULL sort key silently winning). One TakeOrderedAndProject, no
    global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn(
            "sample_key", F.log(w) + _gumbel(F.col(id_col), seed)
        )
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )

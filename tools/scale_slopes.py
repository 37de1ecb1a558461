"""Scale-slope certification for the dedup stack.

The per-round bench only measures sf0.1 (5k docs / 2k vectors). The
100-TB claims for the dedup operators are plan-audited bounds
(candidate volume <= cap^2 per LSH bucket, sum(df^2)-priced AllPairs,
sum(cluster_size^2) per kmeans cluster, no-pair-join span trimming).
This one-off experiment certifies them EMPIRICALLY: synthesize m-fold
corpora whose duplicate structure is controlled, time each operator at
m in (1, 3, 10), and record the wall-time slope — linear-ish in corpus
size at fixed dup rate, or the bound is wrong.

Corpus construction (deterministic, no RNG):

- documents: replica k suffixes every token with ``z<k>`` (one
  regexp_replace), so replica shingle spaces are DISJOINT — every
  within-replica duplicate relation is replicated exactly, no
  cross-replica pairs exist, and the dup RATE is fixed while the
  corpus grows m-fold.
- embeddings: replica 0 is the real table; replicas k>0 are fresh
  deterministic pseudo-random vectors (xxhash64-seeded components),
  near-orthogonal in 64-dim space — the twin MASS stays constant
  while the corpus grows, which is exactly the regime where the
  sum(cluster_size^2) bound must hold. n_centroids scales with m (the
  operator's own contract: the paper uses 50k clusters for LAION).

Usage: python tools/scale_slopes.py [mults] [out_json]
  mults defaults to "1,3,10". Writes one JSON line per (op, m) and a
  summary; transcribe the summary into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000


def build_corpus(spark, m: int, out: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    reps = []
    for k in range(m):
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
                F.regexp_replace(
                    "text", r"([A-Za-z0-9]+)", f"$1z{k}"
                ).alias("text"),
                "lang",
                "source",
                F.length(
                    F.regexp_replace("text", r"([A-Za-z0-9]+)", f"$1z{k}")
                ).cast("int").alias("n_chars"),
            )
        )
    d = reps[0]
    for r in reps[1:]:
        d = d.unionByName(r)
    d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    dim = len(emb.select("embedding").head()["embedding"])
    ereps = [emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))]
    for k in range(1, m):
        ereps.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * OFFSET)).alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: (
                        F.pmod(
                            F.xxhash64(
                                F.col("vec_id") + F.lit(k * OFFSET), i
                            ),
                            F.lit(2000),
                        ).cast("double")
                        / 1000.0
                        - 1.0
                    ),
                ).alias("embedding"),
            )
        )
    e = ereps[0]
    for r in ereps[1:]:
        e = e.unionByName(r)
    e.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))


def run_ops(spark, sf_dir: str, m: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    from cayley_spark.functions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        trim_spans,
    )
    from cayley_spark.functions.similarity import semdedup
    from cayley_spark.streaming.neardup import neardup_pairs_batch

    # Mirror __spark_entry__._t_wide: the synthesized files have few
    # row groups, so an unrepartitioned read would run m=1 on 1 core
    # and m=10 on ~10 — skewing every slope sublinear. Equalize
    # parallelism across m so the slope measures WORK, not layout.
    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    ops = {
        "d_lsh": lambda: minhash_lsh_pairs(
            docs, k=3, num_hashes=16, bands=4, jaccard_threshold=0.2
        ),
        "d_jaccard": lambda: ngram_jaccard_pairs(
            docs, "lang", k=2, threshold=0.35
        ),
        "d_neardup": lambda: neardup_pairs_batch(
            docs.withColumn(
                "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
            ),
            threshold=0.5,
        ),
        "trim_spans": lambda: trim_spans(docs, k=5, min_docs=2),
        # n_centroids scales with the corpus per the operator contract
        "d_semdedup": lambda: semdedup(
            emb, n_centroids=8 * m, iters=2, threshold=0.43
        ),
    }
    if os.environ.get("SCALE_OPS") == "r9":
        # Round-9 additions: certify the new operators' slopes on the
        # same controlled corpora. Edges for LPA replicate the base
        # lineitem bipartite graph with a disjoint id offset per
        # replica — fixed structure, m-fold edges (the same
        # fixed-dup-rate discipline as the documents corpus).
        from cayley_spark.functions.sampling import (
            source_mixture,
            weighted_sample,
        )
        from cayley_spark.functions.sketch import kmv_build
        from cayley_spark.functions.text import tokens
        from cayley_spark.graphs.algorithms import label_propagation

        li = spark.read.parquet(os.path.join(BASE_SF, "lineitem.parquet"))
        base_edges = li.select(
            (F.col("l_orderkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        ).dropDuplicates(["src", "dst"])
        ereps = [base_edges]
        for kk in range(1, m):
            ereps.append(
                base_edges.select(
                    (F.col("src") + F.lit(2 * kk * OFFSET)).alias("src"),
                    (F.col("dst") + F.lit(2 * kk * OFFSET)).alias("dst"),
                )
            )
        edges = ereps[0]
        for r in ereps[1:]:
            edges = edges.unionByName(r)
        edges = edges.repartition(par).localCheckpoint()

        def _kmv():
            toks = docs.select(
                "doc_id", F.explode(tokens(F.col("text"))).alias("t")
            ).select(
                F.concat_ws(
                    ":", F.col("doc_id").cast("string"), F.col("t")
                ).alias("tok")
            )
            return kmv_build(toks, F.col("tok"), k=128)

        ops = {
            "t_kmv": _kmv,
            "g_lpa": lambda: label_propagation(edges, iters=2),
            "t_mixture_up": lambda: source_mixture(
                docs, alpha=0.3, target_frac=1.0, upsample=True
            ),
            "t_wsample": lambda: weighted_sample(
                docs.withColumn(
                    "w", (F.col("n_chars") + F.lit(1)).cast("double")
                ),
                "w",
                k=100,
            ),
            "d_semdedup_far": lambda: semdedup(
                emb,
                n_centroids=8 * m,
                iters=2,
                threshold=0.43,
                keep="far_from_centroid",
            ),
        }

        from cayley_spark.functions.text import (
            hashed_linear_score,
            lm_perplexity,
        )
        from cayley_spark.graphs.algorithms import personalized_pagerank

        weights = spark.range(8192).select(
            F.col("id").alias("bucket"),
            ((F.col("id") % 97) - 48).cast("long").alias("weight"),
        )
        seeds = [
            int(r[0])
            for r in edges.select("src")
            .dropDuplicates(["src"])
            .orderBy("src")
            .limit(2)
            .collect()
        ]
        ops.update(
            {
                "t_perplexity": lambda: lm_perplexity(docs),
                "t_qscore": lambda: hashed_linear_score(
                    docs, weights, buckets=8192
                ),
                "g_ppr": lambda: personalized_pagerank(
                    edges, seeds, iters=2
                ),
            }
        )

    if os.environ.get("SCALE_OPS") == "r11":
        # Round-10/11 additions: the CCNet broadcast scoring path, the
        # in-engine perceptron trainer (both cache_feats settings —
        # the VERDICT r10 #7 experiment), the Gopher/C4/entropy
        # expression batteries, and ExactSubstr dedup. The reference
        # corpus for t_perplexity_ext is the FIXED base documents
        # table at every m — the paper's regime (model fixed, target
        # grows) is exactly what the broadcast claim is about.
        from cayley_spark.functions.dedup import exact_substr_dedup
        from cayley_spark.functions.text import (
            c4_rules,
            gopher_rules,
            hashed_linear_train,
            lm_perplexity,
            lm_train_trigram,
            token_entropy,
        )

        ref = spark.read.parquet(
            os.path.join(BASE_SF, "documents.parquet")
        )
        if ref.rdd.getNumPartitions() < par:
            ref = ref.repartition(par)
        model = lm_train_trigram(ref).localCheckpoint()
        labeled = docs.select(
            "doc_id",
            "text",
            ((F.col("doc_id") % 2) * 2 - 1).cast("int").alias("label"),
        )

        def _train(cache):
            def run():
                out = hashed_linear_train(
                    labeled, buckets=8192, epochs=2, cache_feats=cache
                )
                return out

            return run

        ops = {
            "t_perplexity_ext": lambda: lm_perplexity(
                docs,
                model=model,
                default_nll=20_000_000,
                broadcast_model=True,
            ),
            "t_qtrain_nocache": _train(False),
            "t_qtrain_cache": _train(True),
            "t_gopher": lambda: gopher_rules(docs, min_words=30),
            "t_c4": lambda: c4_rules(docs),
            "t_entropy": lambda: token_entropy(docs),
            "d_substr": lambda: exact_substr_dedup(
                docs, k=10, min_count=2
            ),
        }

    if os.environ.get("SCALE_OPS") == "r12":
        # Round-12 additions: the persisted ExactSubstr index's two
        # cost regimes measured SEPARATELY (VERDICT r11 #4 — the
        # build-vs-warm-admission asymmetry SCALE.md previously
        # argued instead of measuring), and the composed corpus
        # pipeline, whose slope is the end-to-end sum-shape of its
        # certified stages. The %3 split mirrors the d_substr_index
        # oracle entry; replica token spaces stay disjoint so the
        # index hit rate is fixed while the corpus grows m-fold.
        from cayley_spark.functions.dedup_index import SubstrDedupIndex
        from cayley_spark.functions.pipeline import corpus_pipeline

        ref = docs.where(F.col("doc_id") % 3 == 0)
        new = docs.where(F.col("doc_id") % 3 != 0)
        idx_path = f"/tmp/scale_substr_idx_m{m}"

        def _build():
            # the timed work is build+save (explode -> distinct ->
            # parquet); the returned frame is the saved index read
            # back, a negligible 8-byte-row scan for the noop sink
            SubstrDedupIndex.build(ref, k=10).save(idx_path)
            return spark.read.parquet(os.path.join(idx_path, "wins"))

        def _trim():
            # warm admission: corpus side comes from the FILES — the
            # daily-batch cost that matters at 100 TB
            idx = SubstrDedupIndex.load(spark, idx_path)
            return idx.trim(new, min_count=2)

        syn = docs.withColumn(
            "text",
            F.regexp_replace("text", r"((?:\S+ ){4}\S+) ", "$1.\n\n"),
        )
        pbench = syn.where(F.col("doc_id") % 25 == 0)
        pcorp = syn.where(F.col("doc_id") % 25 != 0)

        def _pipe():
            return corpus_pipeline(
                pcorp,
                pbench,
                gopher_min_words=30,
                gopher_stoplist=(
                    "the", "a", "table", "value", "row", "fast",
                ),
                substr_k=10,
                substr_min_count=2,
                jaccard_threshold=0.2,
                alpha=0.5,
                target_frac=0.5,
                n_shards=16,
                shard_salt="x",
            )

        # LSH index setup for _admit, OUTSIDE the timed closure (the
        # substr index gets its own timed _build op; here the build is
        # scaffolding). Rebuild unconditionally: the previous
        # meta-probe cache silently reused an index built from an
        # earlier run's corpus or geometry (ADVICE r12), skewing the
        # measured admission slope against stale data.
        import shutil

        from cayley_spark.functions.dedup_index import LSHDedupIndex

        lpath = f"/tmp/scale_lsh_idx_m{m}"
        shutil.rmtree(lpath, ignore_errors=True)
        LSHDedupIndex.build(ref, k=3).save(lpath)

        def _admit():
            # the composed incremental admission (the daily-batch
            # form): dry-run appends OFF so the measured cost is the
            # admission verdict itself
            from cayley_spark.functions.pipeline import (
                admit_corpus_batch,
            )

            sidx = SubstrDedupIndex.load(spark, idx_path)
            lidx = LSHDedupIndex.load(spark, lpath)
            return admit_corpus_batch(
                syn.where(F.col("doc_id") % 3 != 0),
                sidx,
                lidx,
                gopher_min_words=30,
                gopher_stoplist=(
                    "the", "a", "table", "value", "row", "fast",
                ),
                substr_min_count=2,
                jaccard_threshold=0.2,
                update_indexes=False,
            )

        ops = {
            "d_substr_index_build": _build,
            "d_substr_index_trim": _trim,
            "p_pipeline": _pipe,
            "p_admit": _admit,
        }

    if os.environ.get("SCALE_OPS") == "r13":
        # VERDICT r12 #3: certify admission cost against INDEX
        # growth, not batch size (the r12 pass varied the batch and
        # measured flat — but the daily-batch story's real risk is
        # per-batch cost CREEP as the corpus indexes grow 10×). Here
        # the batch is FIXED — replica 0's doc_id % 3 != 0 slice,
        # identical bytes at every m — while both indexes are built
        # (untimed setup) over the m-fold corpus's % 3 == 0 slice.
        # Replica token spaces are disjoint, so the batch's hit/miss
        # profile against the index is CONSTANT as the index grows
        # m-fold: the measured slope isolates pure index-size cost
        # (file scan + fingerprint semi/anti-join + banded signature
        # join), exactly the SubstrDedupIndex.trim and
        # LSHDedupIndex.dedup warm paths VERDICT names, plus their
        # composition through admit_corpus_batch.
        import shutil

        from cayley_spark.functions.dedup_index import (
            LSHDedupIndex,
            SubstrDedupIndex,
        )
        from cayley_spark.functions.pipeline import admit_corpus_batch

        ref = docs.where(F.col("doc_id") % 3 == 0)  # grows m-fold
        batch = docs.where(
            (F.col("doc_id") < OFFSET) & (F.col("doc_id") % 3 != 0)
        )  # fixed at every m
        spath = f"/tmp/scale_r13_sidx_m{m}"
        lpath = f"/tmp/scale_r13_lidx_m{m}"
        shutil.rmtree(spath, ignore_errors=True)
        shutil.rmtree(lpath, ignore_errors=True)
        SubstrDedupIndex.build(ref, k=10).save(spath)
        LSHDedupIndex.build(ref, k=3).save(lpath)

        def _trim_warm():
            idx = SubstrDedupIndex.load(spark, spath)
            return idx.trim(
                batch.select("doc_id", "text"), min_count=2
            )

        def _lsh_warm():
            idx = LSHDedupIndex.load(spark, lpath)
            return idx.dedup(
                batch.select("doc_id", "text"), jaccard_threshold=0.2
            )

        def _admit_fixed():
            sidx = SubstrDedupIndex.load(spark, spath)
            lidx = LSHDedupIndex.load(spark, lpath)
            syn_b = batch.withColumn(
                "text",
                F.regexp_replace(
                    "text", r"((?:\S+ ){4}\S+) ", "$1.\n\n"
                ),
            )
            # lang="unknown" + suffixed stoplist (round-14 fix): the
            # z<k>-suffixed corpus IDs as unknown and carries no
            # unsuffixed stopwords, so the original r13 run's default
            # lang="en" gate zeroed the batch at stage 1 — this row's
            # original "flat" verdict measured gates + empty joins.
            # Re-run with survivors flowing (SCALE.md round-14 note).
            return admit_corpus_batch(
                syn_b,
                sidx,
                lidx,
                lang="unknown",
                gopher_min_words=30,
                gopher_stoplist=tuple(
                    f"{w}z0"
                    for w in ("the", "a", "table", "value", "row", "fast")
                ),
                substr_min_count=2,
                jaccard_threshold=0.2,
                update_indexes=False,
            )

        ops = {
            "substr_trim_vs_index": _trim_warm,
            "lsh_dedup_vs_index": _lsh_warm,
            "admit_vs_index": _admit_fixed,
        }

    if os.environ.get("SCALE_OPS") == "r14":
        # VERDICT r13 #6: certify the crawl ON-RAMP — WET bytes
        # through read_wet -> wet_to_documents -> admit_corpus_batch
        # — at 1/3/10x WET volume against FIXED indexes. This is the
        # complementary axis to the r13 pass (fixed batch, growing
        # index): here the index is pinned to replica 0's
        # doc_id % 3 == 0 slice (identical at every m) while the WET
        # bytes grow m-fold. Replica token spaces are disjoint, so
        # the batch decomposes into 1 unit that hits the index
        # (replica 0 — constant bytes) and m-1 units of pure misses;
        # every linear-in-batch component (parse, gates, window
        # fingerprinting, signature hashing, within-batch dedup at
        # fixed dup rate, anti-join probes) grows m-fold and the
        # fixed index-side scan does not, so slope <= growth
        # certifies the on-ramp.
        import shutil

        from cayley_spark.functions.dedup_index import (
            LSHDedupIndex,
            SubstrDedupIndex,
        )
        from cayley_spark.functions.pipeline import admit_corpus_batch
        from cayley_spark.sources.warc import read_wet, wet_to_documents

        # the corpus text gets the p_pipeline/p_admit structure
        # synthesis (periods + paragraph breaks every 5 tokens) so
        # the C4 line/sentence gates discriminate instead of zeroing
        # the batch — survivors must flow through every admission
        # stage or the slope is gates-only
        docs = docs.withColumn(
            "text",
            F.regexp_replace("text", r"((?:\S+ ){4}\S+) ", "$1.\n\n"),
        )

        # synthesize WET segments from the m-fold docs: one
        # conversion record per doc with exact WARC/1.0 framing —
        # each text-writer row ends "\r\n\r" so the writer's own
        # "\n" completes the record terminator byte-exactly
        wet_dir = f"/tmp/scale_r14_wet_m{m}"
        shutil.rmtree(wet_dir, ignore_errors=True)
        rec = F.concat(
            F.lit(
                "WARC/1.0\r\nWARC-Type: conversion\r\n"
                "WARC-Target-URI: https://"
            ),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
            F.lit(
                "\r\nWARC-Date: 2026-01-05T10:00:00Z\r\n"
                "WARC-Record-ID: <urn:uuid:"
            ),
            F.col("doc_id").cast("string"),
            F.lit(">\r\nContent-Length: "),
            F.octet_length("text").cast("string"),
            F.lit("\r\n\r\n"),
            F.col("text"),
            F.lit("\r\n\r"),
        )
        docs.select(rec.alias("value")).write.mode("overwrite").text(
            wet_dir
        )

        spath = "/tmp/scale_r14_sidx"
        lpath = "/tmp/scale_r14_lidx"
        shutil.rmtree(spath, ignore_errors=True)
        shutil.rmtree(lpath, ignore_errors=True)
        ref = docs.where(
            (F.col("doc_id") < OFFSET) & (F.col("doc_id") % 3 == 0)
        ).select("doc_id", "text")
        SubstrDedupIndex.build(ref, k=10).save(spath)
        LSHDedupIndex.build(ref, k=3).save(lpath)

        # the scale corpus suffixes every token with z<k>, so the
        # stoplist carries each replica's suffixed forms — pass rate
        # is replica-uniform, keeping the gate survivor RATE constant
        # as m grows
        stop = tuple(
            f"{w}z{k}"
            for w in ("the", "a", "table", "value", "row", "fast")
            for k in range(m)
        )

        def _wet_parse():
            # the scan-speed claim alone: splittable text read +
            # pure-expression parse + documents-contract mapping
            return wet_to_documents(read_wet(spark, wet_dir))

        def _wet_admit():
            sidx = SubstrDedupIndex.load(spark, spath)
            lidx = LSHDedupIndex.load(spark, lpath)
            # lang="unknown": the z<k>-suffixed synthetic corpus IDs
            # as unknown, and the default lang="en" would zero the
            # batch at the first fused gate — every later stage would
            # then run on an EMPTY frame and the slope would measure
            # gates only (the round-14 methodological catch: the
            # r12/r13 composed-admit rows had exactly this hole).
            # Survivor counts are printed per m as the audit.
            return admit_corpus_batch(
                wet_to_documents(read_wet(spark, wet_dir)),
                sidx,
                lidx,
                lang="unknown",
                gopher_min_words=30,
                gopher_stoplist=stop,
                substr_min_count=2,
                jaccard_threshold=0.2,
                update_indexes=False,
            )

        # survivor audit (untimed): the slope is only honest if rows
        # actually flow through every admission stage at every m
        n_adm = _wet_admit().count()
        print(
            json.dumps(
                {"op": "wet_admit_survivors", "m": m, "rows": n_adm}
            ),
            flush=True,
        )

        ops = {"wet_parse": _wet_parse, "wet_admit": _wet_admit}

    if os.environ.get("SCALE_OPS") == "r14b":
        # Slopes for the remaining round-14 operators (the measured-
        # slope discipline: no operator ships on plan-shape reasoning
        # alone).
        import shutil

        from cayley_spark.functions.ann_index import IVFIndex
        from cayley_spark.functions.sketch import sample_sketch_build
        from cayley_spark.operators.joins import asof_join

        # asof two-phase under the HOT-ENTITY regime the form exists
        # for: 8 keys total, every key's series grows m-fold (the
        # single-window form would serialize each key into one task);
        # bucket size fixed, so bucket count grows ~ m while rows per
        # (key, bucket) stay constant — phase 1 task size is flat and
        # the phase-2 carry table grows ~ m at tiny row width.
        n_base = 200_000
        probes = (
            spark.range(n_base * m)
            .select(
                F.col("id").alias("pid"),
                (F.col("id") % 8).alias("k"),
                F.col("id").cast("double").alias("ts"),
            )
        )
        quotes = (
            spark.range(n_base * m)
            .select(
                (F.col("id") % 8).alias("k"),
                (F.col("id").cast("double") + F.lit(0.5)).alias("ts"),
                (F.col("id") % 1000).cast("double").alias("bid"),
            )
        )

        def _asof_two_phase():
            return asof_join(
                probes, quotes, on="k", left_ts="ts",
                right_cols=["bid"], bucket_seconds=1024.0,
            )

        def _sample_sk():
            return sample_sketch_build(
                docs, F.col("doc_id"), F.length("text"), k=256
            )

        # ivf_add_vs_index: FIXED delta appended to an m-fold index —
        # the ivf_stream per-batch cost. Centroid count is FIXED so
        # the axis is pure index-DATA growth (a first run with
        # n_centroids=8m read 4.5x — that slope was the m-fold count
        # of touched partition dirs per append, i.e. FS commit
        # overhead ∝ min(batch, centroids), a config axis, not index
        # bytes); expected flat (an append reads only the centroid
        # sidecar, never the inverted lists).
        ipath = f"/tmp/scale_r14b_ivf_m{m}"
        shutil.rmtree(ipath, ignore_errors=True)
        IVFIndex.build(
            emb.selectExpr(
                "vec_id", "cast(embedding as array<double>) as embedding"
            ),
            n_centroids=16,
        ).save(ipath)
        delta_vecs = emb.where(F.col("vec_id") < OFFSET).limit(500).selectExpr(
            "vec_id + 90000000 as vec_id",
            "cast(embedding as array<double>) as embedding",
        )

        def _ivf_add():
            idx = IVFIndex.load(spark, ipath)
            idx.add(delta_vecs, path=ipath)
            return idx.bucketed.limit(0)  # the timed work is the append

        ops = {
            "asof_bucketed_hotkeys": _asof_two_phase,
            "sample_sketch": _sample_sk,
            "ivf_add_vs_index": _ivf_add,
        }

    def persistent_ids():
        mm = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in mm.keySet().toArray()}

    base = persistent_ids()
    jvm_gc = spark.sparkContext._jvm.System.gc
    out = {}
    for name, fn in ops.items():
        runs = []
        for _ in range(2):  # min-of-2: bench steady-state methodology
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
            mm = spark.sparkContext._jsc.getPersistentRDDs()
            for kk in mm.keySet().toArray():
                if int(kk) not in base:
                    mm.get(kk).unpersist(False)
            jvm_gc()
        out[name] = round(min(runs), 3)
        print(json.dumps({"op": name, "m": m, "sec": out[name]}), flush=True)
    return out


def main() -> None:
    mults = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,3,10").split(",")]
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_slopes.json"
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-slopes")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[int, dict[str, float]] = {}
    for m in mults:
        d = f"/tmp/scale_corpus_m{m}"
        build_corpus(spark, m, d)
        results[m] = run_ops(spark, d, m)
    lo, hi = min(mults), max(mults)
    summary = {
        "mults": mults,
        "base_sf": BASE_SF,
        "results": results,
        "slopes": {
            op: round(results[hi][op] / max(results[lo][op], 1e-9), 2)
            for op in results[lo]
        },
        "corpus_growth": round(hi / lo, 2),
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

"""corpus_pipeline: the end-to-end composition of the certified
corpus-preparation stages (functions/pipeline.py) plus the
predicate/column forms it filters with.

The stage operators are each certified by their own oracle entries;
these tests pin what only the COMPOSITION can get wrong — stage
wiring on a corpus with a planted defect for every stage, the
predicate forms staying bit-equal to the batteries they were
factored from, and (in test_plans.py) the no-raw-rescan plan shape.

Fixture thresholds are chosen so each stage catches ITS plant and no
earlier stage steals it: para_max_df=2 (boilerplate = the 3-doc
plant, not the pairwise passage), substr_min_count=3 (the passage's
3 occurrences, not the exact-copy pair), so the exact copy reaches
MinHash with an identical signature (certain LSH candidacy).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions._cache import unpersist_intermediates
from cayley_spark.functions.pipeline import corpus_pipeline

BOILER = "this paragraph is shared boilerplate text with usual words."
PASSAGE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
)


def _doc(seed: str, n: int = 40) -> str:
    """A '.'-terminated multi-line body that passes the Gopher and C4
    gates: 5-word lines mixing stoplist fill with seeded words, so
    every line is unique to its seed."""
    fill = ("the", "and", "of", "table", "value", "row")
    # every third word is a stopword, cycling through ALL of fill
    # (i % 6 would only ever land on 'the'/'table'), so both the
    # default Gopher stoplist and the test's custom one get >= 2
    # distinct hits per document
    words = [
        fill[(i // 3) % len(fill)] if i % 3 == 0 else f"{seed}{i}"
        for i in range(n)
    ]
    return "\n".join(
        " ".join(words[i : i + 5]) + "." for i in range(0, n - 4, 5)
    )


@pytest.fixture(scope="module")
def fixture_docs(spark):
    """Twelve docs, one plant per stage:

    - 0/1: clean keepers (distinct bodies);
    - 2: French text (langid drop);
    - 3: too short (Gopher/C4 gate drop);
    - 4: no terminal punctuation anywhere (C4 drop);
    - 5/6: share the BOILER paragraph with doc 10 (3 distinct docs >
      para_max_df=2: paragraph dedup trims it everywhere, all
      survive);
    - 7/8: the PASSAGE occurs 3 times (once in 7, twice in 8, each
      line with a distinct tail so paragraph keys differ) >=
      substr_min_count=3: ExactSubstr keeps doc 7's copy, trims
      both of doc 8's;
    - 9: EXACT copy of doc 0 (2-doc duplication sits below both the
      paragraph and substr thresholds, so it reaches MinHash with an
      identical signature: dedup_corpus drops 9, keeps 0);
    - 10: contains the benchmark 5-gram (decontamination drop);
    - 11: the benchmark document itself (not part of the corpus).
    """
    bench_line = "secret benchmark evaluation answer key held out."
    rows = [
        (0, "s0", _doc("alpha")),
        (1, "s1", _doc("bravo")),
        (2, "s0", "le chat et les chiens et le the les et le les et."),
        (3, "s1", "the of and table value row."),
        (4, "s0", _doc("delta").replace(".", "")),
        (5, "s1", _doc("echo") + "\n" + BOILER),
        (6, "s0", _doc("foxtrot") + "\n" + BOILER),
        (7, "s1", _doc("golf") + "\n" + PASSAGE + " seven tail."),
        (
            8,
            "s0",
            _doc("hotel")
            + "\n" + PASSAGE + " eight one tail."
            + "\n" + PASSAGE + " eight two tail.",
        ),
        (9, "s1", _doc("alpha")),
        (10, "s0", _doc("india") + "\n" + BOILER + "\n" + bench_line),
        (11, "s1", _doc("juliet") + "\n" + bench_line),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    return docs.where(F.col("doc_id") != 11), docs.where(
        F.col("doc_id") == 11
    )


def _run(corpus, bench):
    return corpus_pipeline(
        corpus,
        bench,
        gopher_min_words=20,
        gopher_stoplist=("the", "and", "of", "table", "value", "row"),
        para_max_df=2,
        substr_k=10,
        substr_min_count=3,
        jaccard_threshold=0.5,
        contam_n=5,
        alpha=0.5,
        target_frac=10.0,  # rate caps at 1: mixture keeps everything
        n_shards=4,
        shard_salt="t",
    )


def test_corpus_pipeline_planted_defects(spark, fixture_docs):
    corpus, bench = fixture_docs
    out = _run(corpus, bench)
    rows = {r["doc_id"]: r for r in out.collect()}
    unpersist_intermediates(out)
    # 2: langid; 3/4: quality gates; 9: MinHash exact copy of 0;
    # 10: decontamination
    assert set(rows) == {0, 1, 5, 6, 7, 8}
    # the 3-doc boilerplate paragraph is gone from every survivor
    for d in (5, 6):
        assert "boilerplate" not in rows[d]["clean_text"]
        assert rows[d]["clean_text"] != ""
    # ExactSubstr keep-one: doc 7 keeps the passage, doc 8 loses
    # BOTH copies (3 occurrences >= min_count=3, doc 7 is the
    # (id, pos)-minimal keeper)
    assert "alpha beta gamma" in rows[7]["clean_text"]
    assert "alpha beta gamma" not in rows[8]["clean_text"]
    assert "hotel1" in rows[8]["clean_text"]  # body survives
    # metadata restored and shards deterministic
    assert rows[0]["source"] == "s0"
    assert 0 <= rows[0]["shard"] < 4
    assert len(rows[0]["sort_key"]) == 32


def test_corpus_pipeline_no_benchmark_skips_decontamination(
    spark, fixture_docs
):
    corpus, _ = fixture_docs
    out = corpus_pipeline(
        corpus,
        None,
        gopher_min_words=20,
        gopher_stoplist=("the", "and", "of", "table", "value", "row"),
        para_max_df=2,
        substr_k=10,
        substr_min_count=3,
        jaccard_threshold=0.5,
        target_frac=10.0,
        n_shards=4,
    )
    ids = {r["doc_id"] for r in out.collect()}
    unpersist_intermediates(out)
    # doc 10 survives without a benchmark to be contaminated by
    assert ids == {0, 1, 5, 6, 7, 8, 10}


def test_corpus_pipeline_tracks_and_releases_persists(
    spark, fixture_docs
):
    corpus, bench = fixture_docs
    out = _run(corpus, bench)
    out.count()
    handles = getattr(out, "_cayley_persisted", ())
    # filtered + with_src + the stage operators' intermediates
    assert len(handles) >= 2
    released = unpersist_intermediates(out)
    assert released == len(handles)
    assert getattr(out, "_cayley_persisted", ()) == ()


def test_gopher_pass_matches_battery(spark):
    from cayley_spark.functions.text import gopher_pass, gopher_rules

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    stop = ("the", "a", "table", "value", "row", "fast")
    battery = gopher_rules(docs, min_words=30, stoplist=stop).select(
        "doc_id", "pass_gopher"
    )
    pred = docs.select(
        "doc_id",
        gopher_pass(F.col("text"), min_words=30, stoplist=stop).alias(
            "p"
        ),
    )
    diff = battery.join(pred, "doc_id").where(
        F.col("pass_gopher") != F.col("p")
    )
    assert diff.count() == 0
    # sanity: the predicate discriminates on this corpus
    kept = pred.where("p").count()
    assert 0 < kept < docs.count()


def test_c4_forms_match_battery(spark):
    from cayley_spark.functions.text import c4_clean, c4_keep, c4_rules

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn(
            "text",
            F.regexp_replace(
                "text", r"((?:\S+ ){4}\S+) ", "$1.\n\n"
            ),
        )
    )
    battery = c4_rules(docs).select("doc_id", "keep_c4", "clean_text")
    forms = docs.select(
        "doc_id",
        c4_keep(F.col("text")).alias("k"),
        c4_clean(F.col("text")).alias("c"),
    )
    diff = battery.join(forms, "doc_id").where(
        (F.col("keep_c4") != F.col("k"))
        | (F.col("clean_text") != F.col("c"))
    )
    assert diff.count() == 0


def test_quality_gate_struct_matches_separate_gates(spark):
    # the fused (keep, clean) struct the pipelines scan with must be
    # row-identical to the four stacked gate expressions it replaced
    # (r16: the stacked form re-tokenized per reference; the fused
    # form binds the arrays once via a lambda variable)
    from cayley_spark.functions.text import (
        c4_clean,
        c4_keep,
        gopher_pass,
        language_guess,
        quality_gate_struct,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn(
            "text",
            F.regexp_replace("text", r"((?:\S+ ){4}\S+) ", "$1.\n\n"),
        )
    )
    # edge rows: null, empty, whitespace, unicode bullets/ellipses,
    # lorem-ipsum and brace killers, non-English marker text
    extra = spark.createDataFrame(
        [
            (90001, None),
            (90002, ""),
            (90003, "   \n \n"),
            (90004, "• bullet line.\n… trailing ellipsis\nthe a of and."),
            (90005, "lorem ipsum dolor sit amet the the the."),
            (90006, "{json: true} the a of and value row fast."),
            (90007, "der und das der und das der und das."),
            (90008, "the quick brown fox jumps over the lazy dog. " * 20),
        ],
        "doc_id long, text string",
    )
    docs = docs.select("doc_id", "text").unionByName(extra)
    raw = F.col("text")
    stop = ("the", "a", "table", "value", "row", "fast")
    sep = docs.select(
        "doc_id",
        (
            (language_guess(raw) == "en")
            & gopher_pass(raw, min_words=30, stoplist=stop)
            & c4_keep(raw, 5, 3)
        ).alias("keep"),
        c4_clean(raw, 5).alias("clean"),
    )
    gate = quality_gate_struct(
        raw, lang="en", min_words=30, stoplist=stop,
        min_words_per_line=5, min_sentences=3,
    )
    fused = docs.select(
        "doc_id",
        gate.getField("keep").alias("keep"),
        gate.getField("clean").alias("clean"),
    )
    # the composed verdict must agree row-for-row, and the cleaned
    # text must agree on every KEPT row (clean is only consumed for
    # survivors; on null text the stacked forms differ internally but
    # both drop the row)
    diff = (
        sep.alias("s")
        .join(fused.alias("f"), "doc_id")
        .where(
            (F.col("s.keep").eqNullSafe(F.col("f.keep")) == False)  # noqa: E712
            | (F.col("s.keep") & ~F.col("s.clean").eqNullSafe(F.col("f.clean")))
        )
    )
    assert diff.count() == 0
    # sanity: the gate discriminates and keeps something
    kept = fused.where("keep").count()
    assert 0 < kept < docs.count()


def test_export_shards_keep_columns(spark):
    from cayley_spark.functions.sampling import export_shards

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    slim = export_shards(df, n_shards=4, salt="s")
    wide = export_shards(df, n_shards=4, salt="s", keep=True)
    assert set(slim.columns) == {"doc_id", "shard", "sort_key"}
    assert set(wide.columns) == {"doc_id", "text", "shard", "sort_key"}
    a = {r["doc_id"]: (r["shard"], r["sort_key"]) for r in slim.collect()}
    b = {r["doc_id"]: (r["shard"], r["sort_key"]) for r in wide.collect()}
    assert a == b


def test_export_shards_keep_rejects_column_clash(spark):
    """keep=True on an input that already carries shard/sort_key must
    raise, not silently clobber (ADVICE r12): withColumns overwrites
    homonymous columns, so a double application would destroy the
    first assignment without a trace."""
    import pytest

    from cayley_spark.functions.sampling import export_shards

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    once = export_shards(df, n_shards=4, salt="s", keep=True)
    with pytest.raises(ValueError, match="shard"):
        export_shards(once, n_shards=4, salt="t", keep=True)
    pre = df.withColumn("sort_key", F.lit("mine"))
    with pytest.raises(ValueError, match="sort_key"):
        export_shards(pre, n_shards=4, salt="s", keep=True)
    # keep=False projects its own frame and stays unaffected
    assert set(
        export_shards(once, n_shards=4, salt="t").columns
    ) == {"doc_id", "shard", "sort_key"}


def test_cli_pipeline_full(spark, tmp_path, fixture_docs):
    """python -m cayley_spark pipeline full: the composed chain as a
    parquet-in/parquet-out CLI verb (same plants as the library
    test; the default Gopher stoplist also hits the/and/of)."""
    from cayley_spark.__main__ import main

    corpus, bench = fixture_docs
    src = str(tmp_path / "docs.parquet")
    bsrc = str(tmp_path / "bench.parquet")
    out = str(tmp_path / "out")
    corpus.write.parquet(src)
    bench.write.parquet(bsrc)
    assert main([
        "pipeline", "full", "--in", src, "--out", out,
        "--benchmark", bsrc, "--min-words", "20", "--max-df", "2",
        "--substr-k", "10", "--min-count", "3",
        "--jaccard-threshold", "0.5", "--target-frac", "10.0",
        "--n-shards", "4", "--salt", "t",
    ]) == 0
    got = spark.read.parquet(out)
    assert {r["doc_id"] for r in got.collect()} == {0, 1, 5, 6, 7, 8}
    assert {"source", "shard", "sort_key", "clean_text"} <= set(
        got.columns
    )


@pytest.fixture()
def corpus_indexes(spark, tmp_path):
    """A 2-doc admitted corpus persisted into both index forms
    (the daily-batch starting state for admit_corpus_batch).
    bands=16/rows=1 makes LSH candidacy near-certain at the
    moderate Jaccard a line-permuted near-dup produces (0.4-0.5) —
    verification still gates on exact Jaccard."""
    from cayley_spark.functions.dedup_index import (
        LSHDedupIndex,
        SubstrDedupIndex,
    )

    c0 = spark.createDataFrame(
        [
            (100, "s0", _doc("kilo") + "\n" + PASSAGE + " canon tail."),
            (101, "s1", _doc("lima")),
        ],
        "doc_id long, source string, text string",
    )
    sidx = SubstrDedupIndex.build(c0, k=10).save(
        str(tmp_path / "sidx")
    )
    lidx = LSHDedupIndex.build(c0, k=3, num_hashes=16, bands=16).save(
        str(tmp_path / "lidx")
    )
    return c0, sidx, lidx


def _admit(batch, sidx, lidx, bench=None, **kw):
    from cayley_spark.functions.pipeline import admit_corpus_batch

    return admit_corpus_batch(
        batch,
        sidx,
        lidx,
        bench,
        gopher_min_words=20,
        gopher_stoplist=("the", "and", "of", "table", "value", "row"),
        substr_min_count=2,
        jaccard_threshold=0.3,
        num_hashes=16,
        bands=16,
        **kw,
    )


def test_admit_corpus_batch_planted_defects(spark, corpus_indexes):
    """One plant per admission stage, plus the index-growth proof:
    a second batch duplicating a FIRST-batch survivor is rejected
    because the appends made the survivor part of the corpus."""
    c0, sidx, lidx = corpus_indexes
    lima_lines = _doc("lima").split("\n")
    bench_line = "secret benchmark evaluation answer key held out."
    batch1 = spark.createDataFrame(
        [
            (0, "s0", _doc("mike")),  # clean keeper
            (1, "s1", "le chat et les chiens et le the les et le les et."),
            # corpus passage verbatim inside fresh text: trimmed,
            # doc survives
            (2, "s0", _doc("november") + "\n" + PASSAGE + " nov tail."),
            # exact copy of corpus doc 100: every window indexed ->
            # trimmed to empty -> dropped
            (3, "s1", c0.collect()[0]["text"]),
            # line-permuted near-dup of corpus doc 101: no shared
            # 10-token window (every window spans a line boundary),
            # caught by the LSH index instead
            (4, "s0", "\n".join(reversed(lima_lines))),
            # within-batch near-dup pair (6 = line-permuted 5):
            # dedup_corpus keeps the min id
            (5, "s1", _doc("oscar")),
            (6, "s0", "\n".join(reversed(_doc("oscar").split("\n")))),
            # benchmark 5-gram -> decontamination drop
            (8, "s1", _doc("papa") + "\n" + bench_line),
        ],
        "doc_id long, source string, text string",
    )
    bench = spark.createDataFrame(
        [(900, "eval", _doc("quebec") + "\n" + bench_line)],
        "doc_id long, source string, text string",
    )
    out = _admit(batch1, sidx, lidx, bench)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 2, 5}
    # the corpus passage is gone from doc 2, its body intact
    assert "alpha beta" not in rows[2]["clean_text"]
    assert "november1" in rows[2]["clean_text"]
    assert rows[0]["source"] == "s0"

    # second batch: an exact copy of batch-1 survivor doc 0 must be
    # rejected (the appends grew the indexes), a fresh doc admitted
    batch2 = spark.createDataFrame(
        [
            (20, "s0", _doc("mike")),
            (21, "s1", _doc("romeo")),
        ],
        "doc_id long, source string, text string",
    )
    out2 = _admit(batch2, sidx, lidx, bench)
    assert {r["doc_id"] for r in out2.collect()} == {21}


def test_admit_corpus_batch_readmission_is_empty(
    spark, corpus_indexes
):
    """Admitting the same batch twice: the second pass rejects every
    row (all windows now indexed -> trimmed to empty)."""
    _, sidx, lidx = corpus_indexes
    batch = spark.createDataFrame(
        [(0, "s0", _doc("sierra"))],
        "doc_id long, source string, text string",
    )
    first = _admit(batch, sidx, lidx)
    assert {r["doc_id"] for r in first.collect()} == {0}
    second = _admit(batch, sidx, lidx)
    assert second.count() == 0


def test_admit_corpus_batch_no_update_leaves_indexes(
    spark, corpus_indexes
):
    """update_indexes=False: a dry-run admission (returns survivors,
    appends nothing — the same batch still admits afterwards)."""
    from cayley_spark.functions._cache import unpersist_intermediates

    _, sidx, lidx = corpus_indexes
    batch = spark.createDataFrame(
        [(0, "s0", _doc("tango"))],
        "doc_id long, source string, text string",
    )
    dry = _admit(batch, sidx, lidx, update_indexes=False)
    assert {r["doc_id"] for r in dry.collect()} == {0}
    unpersist_intermediates(dry)
    wet = _admit(batch, sidx, lidx)
    assert {r["doc_id"] for r in wet.collect()} == {0}


def test_admit_corpus_batch_durable_out_survives_append_crash(
    spark, tmp_path, corpus_indexes, monkeypatch
):
    """ADVICE r12 (medium): with durable_out, the admitted rows are
    written BEFORE any index append, so a crash mid-append never
    loses the batch — the saved output re-appends to both indexes
    and tomorrow's batches see the admission."""
    from cayley_spark.functions.dedup_index import SubstrDedupIndex

    _, sidx, lidx = corpus_indexes
    batch = spark.createDataFrame(
        [(0, "s0", _doc("victor"))],
        "doc_id long, source string, text string",
    )
    out = str(tmp_path / "admitted")
    wins_before = sidx.wins.count()
    sigs_before = lidx.sigs.count()

    def boom(self, *a, **kw):
        raise RuntimeError("disk full")

    monkeypatch.setattr(SubstrDedupIndex, "append", boom)
    with pytest.raises(RuntimeError, match="disk full"):
        _admit(batch, sidx, lidx, durable_out=out)
    monkeypatch.undo()
    # the batch is durable despite the crash; the indexes are intact
    saved = spark.read.parquet(out)
    assert {r["doc_id"] for r in saved.collect()} == {0}
    assert sidx.wins.count() == wins_before
    assert lidx.sigs.count() == sigs_before
    # mechanical recovery: re-append the saved output to BOTH indexes
    # (if_absent=True — the documented recovery form)
    appendable = saved.select("doc_id", F.col("clean_text").alias("text"))
    sidx.append(appendable, if_absent=True)
    lidx.append(appendable, if_absent=True)
    # the recovered admission is visible: re-admitting rejects it
    again = _admit(batch, sidx, lidx, update_indexes=False)
    assert again.count() == 0


def test_admit_recovery_reappend_is_idempotent(
    spark, tmp_path, corpus_indexes
):
    """A recovery re-append that REPEATS an append which did land
    (crash after append, before the recovery marker) is EXACTLY
    idempotent with if_absent=True: zero new rows, verdicts
    unchanged. A plain duplicate append is also exercised: its
    duplicate rows squeeze out under compact() (and are documented
    as NOT fully verdict-neutral while they exist — they count
    against the hot-bucket occupancy cap)."""
    _, sidx, lidx = corpus_indexes
    batch = spark.createDataFrame(
        [(0, "s0", _doc("whiskey"))],
        "doc_id long, source string, text string",
    )
    out = str(tmp_path / "admitted")
    admitted = _admit(batch, sidx, lidx, durable_out=out)
    assert {r["doc_id"] for r in admitted.collect()} == {0}
    sigs_once = lidx.sigs.count()
    wins_once = sidx.wins.count()
    # recovery repeats both appends from the durable output in the
    # documented if_absent form: EXACTLY idempotent
    saved = spark.read.parquet(out)
    appendable = saved.select("doc_id", F.col("clean_text").alias("text"))
    sidx.append(appendable, if_absent=True)
    lidx.append(appendable, if_absent=True)
    assert lidx.sigs.count() == sigs_once
    assert sidx.wins.count() == wins_once
    from cayley_spark.functions._cache import unpersist_intermediates

    # verdicts unchanged: the admitted doc still rejects, fresh admits
    rej = _admit(batch, sidx, lidx, update_indexes=False)
    assert rej.count() == 0
    unpersist_intermediates(rej)
    fresh = spark.createDataFrame(
        [(9, "s1", _doc("xray"))],
        "doc_id long, source string, text string",
    )
    ok = _admit(fresh, sidx, lidx, update_indexes=False)
    assert {r["doc_id"] for r in ok.collect()} == {9}
    # release the dry runs' persisted intermediates BEFORE compacting:
    # their cached plans capture the pre-compact file listing, and
    # Spark's cache matcher substitutes them into later identical
    # plans (the staleness compact()'s docstring warns about)
    unpersist_intermediates(ok)
    # a PLAIN duplicate append leaves duplicate rows; compact removes
    # them and verdicts return to the never-duplicated state
    sidx.append(appendable)
    lidx.append(appendable)
    assert lidx.sigs.count() == 2 * sigs_once - 2  # c0 rows not doubled
    lidx.compact()
    sidx.compact()
    assert lidx.sigs.count() == sigs_once
    assert sidx.wins.count() == sidx.wins.distinct().count()
    final_rej = _admit(batch, sidx, lidx, update_indexes=False)
    assert final_rej.count() == 0
    unpersist_intermediates(final_rej)
    final_ok = _admit(fresh, sidx, lidx, update_indexes=False)
    assert final_ok.count() == 1
    unpersist_intermediates(final_ok)


def test_cli_pipeline_admit(spark, tmp_path, corpus_indexes):
    """python -m cayley_spark pipeline admit: incremental admission
    against the saved index dirs (dup-of-corpus rejected, fresh doc
    admitted and appended)."""
    from cayley_spark.__main__ import main

    c0, sidx, lidx = corpus_indexes
    src = str(tmp_path / "batch.parquet")
    out = str(tmp_path / "admitted")
    spark.createDataFrame(
        [
            (0, "s0", _doc("uniform")),
            (3, "s1", c0.collect()[0]["text"]),  # corpus copy
        ],
        "doc_id long, source string, text string",
    ).write.parquet(src)
    assert main([
        "pipeline", "admit", "--in", src, "--out", out,
        "--substr-index", sidx.path, "--lsh-index", lidx.path,
        "--min-words", "20", "--jaccard-threshold", "0.3",
    ]) == 0
    got = spark.read.parquet(out)
    assert {r["doc_id"] for r in got.collect()} == {0}
    # the admission appended: re-admitting doc 0 now rejects it
    out2 = str(tmp_path / "admitted2")
    assert main([
        "pipeline", "admit", "--in", src, "--out", out2,
        "--substr-index", sidx.path, "--lsh-index", lidx.path,
        "--min-words", "20", "--jaccard-threshold", "0.3",
    ]) == 0
    assert spark.read.parquet(out2).count() == 0

"""CLI — the reference's ``cayley`` command surface over Spark.

Re-expression of cmd/cayley (reference cmd/cayley/command/database.go
load/dump, convert.go, repl.go, http.go):

    python -m cayley_spark init    --db DIR [--quads FILE]
    python -m cayley_spark load    --db DIR --quads FILE [--init]
    python -m cayley_spark dump    --db DIR --out FILE
    python -m cayley_spark convert --src FILE --dst FILE
    python -m cayley_spark repl    --db DIR [--lang gizmo]
    python -m cayley_spark http    --db DIR [--host H] [--port P]
    python -m cayley_spark query   --db DIR [--lang L] [--limit N] [Q]
    python -m cayley_spark dedup   --db DIR --type T [--pred P]
    python -m cayley_spark health  [URL]          (health.go)
    python -m cayley_spark schema  linkedql       (schema.go)

``init`` creates an empty store (errors if one exists — reference
database.go:66-80 NewInitDatabaseCmd; its ``-i/--load`` flag maps to
``--quads``); ``load --init`` bootstraps the store first
(database.go:101-104,135). ``dedup`` merges blank nodes of ``--type``
whose properties hash identically (dedup.go:29-53; ``--pred`` defaults
to rdf:type and an empty --type errors, same as the reference).

``query`` reads the query string from the argument or stdin and
prints one JSON result per line (reference repl.go:76-80 NewQueryCmd).

``--db`` is a parquet store directory (GraphStore.save layout).
Quad-file formats are chosen by extension, matching the reference's
format registry: .nq/.nt/.nq.gz n-quads, .pq/.pq.gz pquads,
.jsonld JSON-LD, .json JSON quads.
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys


def _spark(cpus: int | None = None):
    from pyspark.sql import SparkSession

    n = cpus or os.cpu_count() or 4
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("cayley_spark-cli")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _read_any(spark, path: str):
    from .sources.formats import read_json_quads, read_jsonld
    from .sources.nquads import read_nquads
    from .sources.pquads import read_pquads

    p = path[:-3] if path.endswith(".gz") else path
    if p.endswith((".nq", ".nt")):
        if path.endswith(".gz"):  # spark.read.text handles .gz natively
            return read_nquads(spark, path)
        return read_nquads(spark, path)
    if p.endswith(".pq"):
        return read_pquads(spark, path)
    if p.endswith(".jsonld"):
        return read_jsonld(spark, path)
    if p.endswith(".json"):
        return read_json_quads(spark, path)
    raise SystemExit(f"unknown quad format: {path}")


def _write_any(store, path: str) -> int:
    from .sources.formats import write_json_quads, write_jsonld
    from .sources.nquads import write_nquads
    from .sources.pquads import write_pquads

    p = path[:-3] if path.endswith(".gz") else path
    if p.endswith((".nq", ".nt")):
        lines = write_nquads(store)
        opener = gzip.open if path.endswith(".gz") else open
        n = 0
        with opener(path, "wt") as f:
            for r in lines.toLocalIterator():
                f.write(r["value"] + "\n")
                n += 1
        return n
    if p.endswith(".pq"):
        return write_pquads(store, path)
    if p.endswith(".jsonld"):
        with open(path, "w") as f:
            f.write(write_jsonld(store))
        return store.quads.count()
    if p.endswith(".json"):
        with open(path, "w") as f:
            f.write(write_json_quads(store))
        return store.quads.count()
    raise SystemExit(f"unknown quad format: {path}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cayley_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in (
        "init", "load", "dump", "repl", "http", "query", "dedup", "compact",
    ):
        s = sub.add_parser(name)
        s.add_argument("--db", required=True, help="parquet store dir")
        if name == "init":
            # reference database.go:43: -i/--load = quad file to load
            # after initialization
            s.add_argument("--quads", "-i", default=None)
        if name == "load":
            s.add_argument("--quads", required=True)
            s.add_argument(
                "--init",
                action="store_true",
                help="initialize the database before using it",
            )
        if name == "dedup":
            # reference cmd/cayley/command/dedup.go:50-52
            s.add_argument(
                "--pred",
                default="<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
                help="type predicate to use to find nodes",
            )
            s.add_argument(
                "--type", default="", help="type value to use to find nodes"
            )
        if name == "dump":
            s.add_argument("--out", required=True)
        if name in ("dump", "query"):
            s.add_argument(
                "--as-of",
                type=int,
                default=None,
                dest="as_of",
                help="time travel: read the store as it stood after "
                "this delta-log batch (save_deltas returns batch "
                "ids; 0 = the base; bounded below by the compaction "
                "watermark)",
            )
        if name == "repl":
            s.add_argument("--lang", default="gizmo")
        if name == "http":
            s.add_argument("--host", default="127.0.0.1")
            s.add_argument("--port", type=int, default=64210)
        if name == "query":
            # reference cmd/cayley/command/repl.go:76-80 NewQueryCmd
            s.add_argument("--lang", default="gizmo")
            s.add_argument("--limit", type=int, default=100)
            s.add_argument("querystr", nargs="?", default=None)
    c = sub.add_parser("convert")
    c.add_argument("--src", required=True)
    c.add_argument("--dst", required=True)
    h = sub.add_parser("health")  # cmd/cayley/command/health.go
    h.add_argument("url", nargs="?", default="http://localhost:64210/")
    sc = sub.add_parser("schema")  # cmd/cayley/command/schema.go
    sc.add_argument("kind", choices=["linkedql"])
    # training-data pipeline verbs (repo extension — no reference
    # analog): parquet in, parquet out, pure library calls
    pp = sub.add_parser(
        "pipeline",
        help="corpus transforms: dedup/chunk/pack/split/quality/"
             "html/mix/shard/paradedup/spans/tiers/substr/compact/"
             "full (the composed end-to-end chain)",
    )
    pp.add_argument(
        "op",
        choices=[
            "dedup", "chunk", "pack", "split", "quality",
            "html", "mix", "shard", "paradedup", "spans", "tiers",
            "substr", "compact", "full", "admit", "wet",
        ],
    )
    pp.add_argument("--in", dest="inp", required=True, help="input parquet")
    pp.add_argument("--out", required=True, help="output parquet dir")
    pp.add_argument("--id-col", default="doc_id")
    pp.add_argument("--text-col", default="text")
    pp.add_argument("--chunk-chars", type=int, default=512)
    pp.add_argument("--overlap", type=int, default=0)
    pp.add_argument("--budget", type=int, default=2048)
    pp.add_argument("--jaccard-threshold", type=float, default=0.8)
    pp.add_argument("--val-buckets", type=int, default=1)
    pp.add_argument("--test-buckets", type=int, default=1)
    pp.add_argument("--html-col", default="html")
    pp.add_argument("--source-col", default="source")
    pp.add_argument("--alpha", type=float, default=0.5)
    pp.add_argument("--target-frac", type=float, default=0.5)
    pp.add_argument("--n-shards", type=int, default=16)
    pp.add_argument("--salt", default="")
    pp.add_argument("--max-df", type=int, default=1)
    pp.add_argument("--span-k", type=int, default=5)
    pp.add_argument("--min-docs", type=int, default=2)
    pp.add_argument("--n-buckets", type=int, default=10)
    pp.add_argument("--substr-k", type=int, default=50)
    pp.add_argument("--min-count", type=int, default=2)
    pp.add_argument("--target-mb", type=int, default=512)
    # `pipeline full` (the composed corpus_pipeline chain)
    pp.add_argument(
        "--benchmark",
        default=None,
        help="parquet of eval/benchmark docs to decontaminate against",
    )
    pp.add_argument("--lang", default="en")
    pp.add_argument("--min-words", type=int, default=50)
    pp.add_argument("--contam-n", type=int, default=5)
    # `pipeline admit` (incremental admission against saved indexes)
    pp.add_argument(
        "--substr-index", default=None,
        help="SubstrDedupIndex dir (built/saved beforehand)",
    )
    pp.add_argument(
        "--lsh-index", default=None,
        help="LSHDedupIndex dir (built/saved beforehand)",
    )
    pp.add_argument(
        "--no-update", action="store_true",
        help="dry-run: admit without appending to the indexes",
    )
    args = ap.parse_args(argv)

    # Spark-free commands first
    if args.cmd == "health":
        import urllib.request

        url = args.url.rstrip("/") + "/health"
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                code = r.status
        except Exception as e:
            print(f"{url}: {e}", file=sys.stderr)
            return 1
        if code != 204:
            print(
                f"/health responded with status code {code}, expected 204",
                file=sys.stderr,
            )
            return 1
        print(f"{url} ok")
        return 0
    if args.cmd == "schema":
        from .query.linkedql_schema import generate_json

        print(generate_json())
        return 0

    if args.cmd == "dedup" and not args.type:
        # reference dedup.go:44-46
        print("no type is specified", file=sys.stderr)
        return 1
    if args.cmd == "init" and os.path.exists(os.path.join(args.db, "quads")):
        # reference graph.ErrDatabaseExists semantics
        print(f"database already exists: {args.db}", file=sys.stderr)
        return 1

    spark = _spark()
    if args.cmd == "pipeline":
        return _pipeline(spark, args)
    from .store import GraphStore

    if args.cmd == "init":
        if args.quads:
            st = _read_any(spark, args.quads)
        else:
            st = GraphStore.empty(spark)
        st.save(args.db)
        print(f"initialized {args.db} ({st.stats()['quads']} quads)")
    elif args.cmd == "load":
        if args.init and not os.path.exists(os.path.join(args.db, "quads")):
            GraphStore.empty(spark).save(args.db)
        st = _read_any(spark, args.quads)
        st.save(args.db)
        print(f"loaded {st.stats()['quads']} quads into {args.db}")
    elif args.cmd == "compact":
        # fold the save_deltas append-only log into the base parquet
        # layout (store-level maintenance; `pipeline compact` is the
        # generic small-files rewrite for arbitrary parquet)
        st = GraphStore.compact(spark, args.db)
        s = st.stats()
        print(
            f"compacted {args.db}: {s['quads']} quads, {s['nodes']} nodes"
        )
    elif args.cmd == "dedup":
        from .values import IRI

        st = GraphStore.load(spark, args.db).persist()
        before = st.stats()
        out = st.dedup_bnodes(
            type_pred=IRI(args.pred.strip("<>")),
            type_value=IRI(args.type.strip("<>")),
        )
        # write to a sibling tmp dir then swap: Spark cannot overwrite
        # the parquet files it is concurrently reading from
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(
            prefix=".dedup-", dir=os.path.dirname(args.db.rstrip("/")) or "."
        )
        out.save(tmp)
        # after-counts from the WRITTEN store: stats() on the lazy
        # result would re-run the whole dedup pipeline a second time
        after = {
            "nodes": spark.read.parquet(os.path.join(tmp, "nodes")).count(),
            "quads": spark.read.parquet(os.path.join(tmp, "quads")).count(),
        }
        # drop the cache entries for the old files BEFORE the swap:
        # Spark's CacheManager matches by canonicalized plan (the scan
        # path), so a later read of the swapped path would silently be
        # served the old persisted data
        st.nodes.unpersist(True)
        st.quads.unpersist(True)
        for part in ("quads", "nodes"):
            shutil.rmtree(os.path.join(args.db, part))
            os.rename(os.path.join(tmp, part), os.path.join(args.db, part))
        os.rmdir(tmp)
        print(
            f"deduplicated: {before['nodes']} -> {after['nodes']} nodes, "
            f"{before['quads']} -> {after['quads']} quads"
        )
    elif args.cmd == "dump":
        st = GraphStore.load(spark, args.db, as_of=args.as_of)
        n = _write_any(st, args.out)
        print(f"dumped {n} quads to {args.out}")
    elif args.cmd == "convert":
        st = _read_any(spark, args.src)
        n = _write_any(st, args.dst)
        print(f"converted {n} quads {args.src} -> {args.dst}")
    elif args.cmd == "repl":
        from .repl import run_repl

        st = GraphStore.load(spark, args.db).persist()
        run_repl(st, lang=args.lang)
    elif args.cmd == "http":
        from .server.http import serve

        st = GraphStore.load(spark, args.db).persist()
        print(f"serving on {args.host}:{args.port}")
        serve(st, args.host, args.port)
    elif args.cmd == "query":
        import json as _json

        from .query.session import Collation, get_session

        q = args.querystr
        if q is None:
            q = sys.stdin.read()
        st = GraphStore.load(spark, args.db, as_of=args.as_of).persist()
        rows = get_session(st, args.lang).execute(
            q, limit=args.limit, collation=Collation.JSON
        )
        for r in rows:
            print(_json.dumps(r, ensure_ascii=False, default=str))
    return 0


def _pipeline(spark, args) -> int:
    """`pipeline` verb dispatch: read parquet, apply one corpus
    transform, write parquet, report row counts."""
    if args.op == "wet":
        # crawl on-ramp: WET segment files (dir/glob, .gz ok) ->
        # documents-contract parquet — the input of every other verb
        from .sources.warc import read_wet, wet_to_documents

        docs = wet_to_documents(read_wet(spark, args.inp))
        docs.write.mode("overwrite").parquet(args.out)
        n_out = spark.read.parquet(args.out).count()
        print(f"wet: -> {n_out} documents ({args.out})")
        return 0
    df = spark.read.parquet(args.inp)
    n_in = df.count()
    if args.op == "dedup":
        from .functions._cache import unpersist_intermediates
        from .functions.dedup import dedup_corpus

        out = dedup_corpus(
            df,
            id_col=args.id_col,
            text_col=args.text_col,
            jaccard_threshold=args.jaccard_threshold,
        )
        out.write.mode("overwrite").parquet(args.out)
        unpersist_intermediates(out)
    elif args.op == "chunk":
        from .functions.chunking import chunk_documents

        chunk_documents(
            df,
            chunk_chars=args.chunk_chars,
            overlap=args.overlap,
            id_col=args.id_col,
            text_col=args.text_col,
        ).write.mode("overwrite").parquet(args.out)
    elif args.op == "pack":
        from .functions.chunking import pack_sequences

        pack_sequences(
            df,
            budget=args.budget,
            id_col=args.id_col,
            text_col=args.text_col,
        ).write.mode("overwrite").parquet(args.out)
    elif args.op == "split":
        from .functions.sampling import hash_split

        splits = hash_split(
            df,
            text_col=args.text_col,
            id_col=args.id_col,
            val_buckets=args.val_buckets,
            test_buckets=args.test_buckets,
        )
        df.join(splits.select(args.id_col, "split"), args.id_col).write.mode(
            "overwrite"
        ).parquet(args.out)
    elif args.op == "html":
        from .functions.text import html_text_stats

        html_text_stats(
            df, id_col=args.id_col, html_col=args.html_col
        ).write.mode("overwrite").parquet(args.out)
    elif args.op == "mix":
        from .functions.sampling import source_mixture

        source_mixture(
            df,
            source_col=args.source_col,
            alpha=args.alpha,
            target_frac=args.target_frac,
            text_col=args.text_col,
        ).write.mode("overwrite").parquet(args.out)
    elif args.op == "shard":
        from .functions.sampling import export_shards

        sh = export_shards(
            df, id_col=args.id_col, n_shards=args.n_shards, salt=args.salt
        )
        # the canonical export layout: one sorted file per shard
        df.join(sh, args.id_col).repartition(
            args.n_shards, "shard"
        ).sortWithinPartitions("sort_key").write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(args.out)
    elif args.op == "paradedup":
        from .functions.text import paragraph_dedup

        paragraph_dedup(
            df, id_col=args.id_col, text_col=args.text_col,
            max_df=args.max_df,
        ).write.mode("overwrite").parquet(args.out)
    elif args.op == "spans":
        from .functions.dedup import duplicated_spans

        duplicated_spans(
            df, id_col=args.id_col, text_col=args.text_col,
            k=args.span_k, min_docs=args.min_docs,
        ).write.mode("overwrite").parquet(args.out)
    elif args.op == "substr":
        from .functions._cache import unpersist_intermediates
        from .functions.dedup import exact_substr_dedup

        out = exact_substr_dedup(
            df, id_col=args.id_col, text_col=args.text_col,
            k=args.substr_k, min_count=args.min_count,
        )
        out.write.mode("overwrite").parquet(args.out)
        unpersist_intermediates(out)
    elif args.op == "full":
        # the composed end-to-end chain (functions/pipeline.py):
        # language ID -> Gopher -> C4 -> paragraph dedup ->
        # ExactSubstr -> MinHash dedup -> decontamination (when
        # --benchmark is given) -> source mixing -> export shards
        from .functions._cache import unpersist_intermediates
        from .functions.pipeline import corpus_pipeline

        bench = (
            spark.read.parquet(args.benchmark)
            if args.benchmark
            else None
        )
        out = corpus_pipeline(
            df,
            bench,
            id_col=args.id_col,
            text_col=args.text_col,
            source_col=args.source_col,
            lang=args.lang,
            gopher_min_words=args.min_words,
            para_max_df=args.max_df,
            substr_k=args.substr_k,
            substr_min_count=args.min_count,
            jaccard_threshold=args.jaccard_threshold,
            contam_n=args.contam_n,
            alpha=args.alpha,
            target_frac=args.target_frac,
            n_shards=args.n_shards,
            shard_salt=args.salt,
        )
        out.write.mode("overwrite").parquet(args.out)
        unpersist_intermediates(out)
    elif args.op == "admit":
        # incremental admission: quality gates -> ExactSubstr trim
        # against the fingerprint index -> within-batch +
        # cross-corpus LSH dedup -> decontamination -> index appends
        from .functions._cache import unpersist_intermediates
        from .functions.dedup_index import LSHDedupIndex, SubstrDedupIndex
        from .functions.pipeline import admit_corpus_batch

        if not args.substr_index or not args.lsh_index:
            print(
                "pipeline admit requires --substr-index and --lsh-index",
                file=sys.stderr,
            )
            return 1
        sidx = SubstrDedupIndex.load(spark, args.substr_index)
        lidx = LSHDedupIndex.load(spark, args.lsh_index)
        bench = (
            spark.read.parquet(args.benchmark) if args.benchmark else None
        )
        # durable_out: the admitted rows are written to --out BEFORE
        # any index append (ADVICE r12) — a crash mid-append can
        # always be recovered by re-appending the saved output,
        # whereas append-first would lose the batch permanently
        # (re-admission returns empty once the windows are indexed)
        out = admit_corpus_batch(
            df,
            sidx,
            lidx,
            bench,
            id_col=args.id_col,
            text_col=args.text_col,
            source_col=args.source_col,
            lang=args.lang,
            gopher_min_words=args.min_words,
            substr_min_count=args.min_count,
            jaccard_threshold=args.jaccard_threshold,
            contam_n=args.contam_n,
            num_hashes=lidx.num_hashes,
            bands=lidx.bands,
            minhash_k=lidx.k,
            update_indexes=not args.no_update,
            durable_out=args.out,
        )
        unpersist_intermediates(out)
    elif args.op == "tiers":
        from .functions.text import quality_buckets

        quality_buckets(
            df, n_buckets=args.n_buckets, id_col=args.id_col,
            text_col=args.text_col,
        ).write.mode("overwrite").parquet(args.out)
    elif args.op == "compact":
        # small-files maintenance: a long-running ingest leaves a
        # directory of tiny parquet files whose per-file open/footer
        # cost dominates scans; rewrite to ~target-mb files. Row
        # count is preserved exactly; file count drops to
        # ceil(bytes / target). Uses the input's on-disk size (not
        # row count) so the result is layout-, not data-, dependent.
        import math
        import os as _os

        if _os.path.isdir(args.inp):
            total = sum(
                _os.path.getsize(_os.path.join(r, f))
                for r, _, fs in _os.walk(args.inp)
                for f in fs
                if f.endswith(".parquet")
            )
        else:
            total = _os.path.getsize(args.inp)
        n_files = max(1, math.ceil(total / (args.target_mb * 1024 * 1024)))
        df.coalesce(n_files).write.mode("overwrite").parquet(args.out)
    elif args.op == "quality":
        from .functions.text import quality_stats, repetition_stats

        q = quality_stats(df, text_col=args.text_col, id_col=args.id_col)
        r = repetition_stats(df, id_col=args.id_col, text_col=args.text_col)
        r = r.drop(*[c for c in r.columns if c != args.id_col and c in q.columns])
        q.join(r, args.id_col).write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    print(f"{args.op}: {n_in} rows in -> {n_out} rows out ({args.out})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

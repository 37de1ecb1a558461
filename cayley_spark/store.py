"""GraphStore: the quad store as two DataFrames.

Mirrors the reference's storage decomposition (its SQL backend's
``nodes``/``quads`` tables, /root/reference/graph/sql/database.go:64-97;
dictionary encoding per graph/refs/refs.go:47-58) re-expressed as
columnar Parquet-backed DataFrames:

- ``quads(s, p, o, l)``  — one row per edge; each column a 64-bit node id
  (xxhash64 of the value's canonical key); ``l`` null for triples.
- ``nodes(id, kind, term, str, lang, datatype, i64, f64, bool, ts, refs)``
  — the value dictionary. ``term`` is the precomputed N-Quads surface
  form (used for rendering and for ``Order()``'s canonical string sort,
  reference graph/iterator/sort.go:69-75).

The per-direction B-tree/LSM indexes of the reference (graph/sql/
database.go:99-144, graph/kv/indexing.go:55-71) are replaced by Parquet
min/max + dictionary pushdown: ``save()`` range-partitions quads by
``(p, s)`` so predicate-constrained scans prune files — predicates are
the highest-selectivity direction in practice (SURVEY.md §4.3).

Scale notes: all id computation is JVM-side (`xxhash64` over concat'd
canonical keys) inside whole-stage codegen; nothing here collects to the
driver except explicit result materialization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .values import XSD, Value, coerce

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("str", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("datatype", T.StringType(), True),
        T.StructField("i64", T.LongType(), True),
        T.StructField("f64", T.DoubleType(), True),
        T.StructField("bool", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("refs", T.IntegerType(), True),
    ]
)

QUAD_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType(), False),
        T.StructField("p", T.LongType(), False),
        T.StructField("o", T.LongType(), False),
        T.StructField("l", T.LongType(), True),
    ]
)

DIRS = ("s", "p", "o", "l")


def _node_row(v: Value) -> tuple:
    from . import values as V

    kind, s, lang, dt, i64, f64, b, ts = (None,) * 8
    if isinstance(v, V.IRI):
        kind, s = "iri", v.s
    elif isinstance(v, V.BNode):
        kind, s = "bnode", v.s
    elif isinstance(v, V.String):
        kind, s = "string", v.s
    elif isinstance(v, V.LangString):
        kind, s, lang = "lang_string", v.s, v.lang
    elif isinstance(v, V.TypedString):
        kind, s, dt = "typed_string", v.s, v.datatype
    elif isinstance(v, V.Int):
        kind, i64 = "int", v.v
    elif isinstance(v, V.Float):
        kind, f64 = "float", v.v
    elif isinstance(v, V.Bool):
        kind, b = "bool", v.v
    elif isinstance(v, V.Time):
        kind, ts = "time", v.v
    elif isinstance(v, V.Raw):
        kind, s = "raw", v.s
    else:  # pragma: no cover
        raise TypeError(f"unknown value type {v!r}")
    return (v.id, kind, v.term(), s, lang, dt, i64, f64, b, ts, 1)


@dataclass
class GraphStore:
    """Immutable pair of nodes/quads DataFrames + a SparkSession."""

    spark: SparkSession
    nodes: DataFrame
    quads: DataFrame

    def __post_init__(self):
        # Pin the session timezone: time-value node ids hash
        # cast(timestamp as string), which renders in the session tz.
        # Driver-side keys (values.spark_ts_str) assume UTC; without
        # the pin, stores built in a non-UTC session would silently
        # miss every time-literal lookup.
        if self.spark.conf.get("spark.sql.session.timeZone") != "UTC":
            self.spark.conf.set("spark.sql.session.timeZone", "UTC")

    # ---------------- constructors ----------------

    @classmethod
    def from_quad_values(
        cls, spark: SparkSession, quads: list[tuple]
    ) -> "GraphStore":
        """Driver-side constructor from a list of 3/4-tuples of Values
        (or coercible natives). The memstore equivalent — for fixtures
        and tests; use the distributed paths for scale."""
        vals: dict[int, Value] = {}
        qrows = []
        for q in quads:
            q = tuple(coerce(x) if x is not None else None for x in q)
            if len(q) == 3:
                q = (*q, None)
            s, p, o, lab = q
            ids = []
            for v in (s, p, o, lab):
                if v is None:
                    ids.append(None)
                else:
                    vals[v.id] = v
                    ids.append(v.id)
            qrows.append(tuple(ids))
        nrows = [_node_row(v) for v in vals.values()]
        nodes = spark.createDataFrame(nrows, NODE_SCHEMA)
        qdf = spark.createDataFrame(qrows, QUAD_SCHEMA)
        return cls(spark, nodes, qdf)

    @classmethod
    def empty(cls, spark: SparkSession) -> "GraphStore":
        """Empty store — the ``init`` bootstrap target (reference
        cmd/cayley/command/database.go:196 initDatabase)."""
        return cls(
            spark,
            spark.createDataFrame([], NODE_SCHEMA),
            spark.createDataFrame([], QUAD_SCHEMA),
        )

    @classmethod
    def from_term_quads(cls, term_quads: DataFrame) -> "GraphStore":
        """Distributed constructor from a DataFrame with string columns
        ``st, pt, ot, lt`` holding N-Quads terms (``lt`` nullable).
        All decomposition/hash work stays JVM-side and map-side (no
        shuffle for the quads table: each direction's id is computed by
        expression, not by a dictionary join)."""
        spark = term_quads.sparkSession
        # Per the N-Quads grammar only the OBJECT position can hold a
        # literal: subject is IRI|bnode, predicate is IRI, label is
        # IRI|bnode. Exploiting this keeps the generated code small
        # (the literal-parsing regexes appear once, for ``ot`` only) —
        # the naive per-direction inline form blew janino's 64 KB
        # method limit and knocked the whole ingest out of
        # whole-stage codegen.
        staged = term_quads.select(
            "st",
            "pt",
            "lt",
            *_parts(F.col("ot"), "_o"),
        ).withColumn("__kind_o", _kind_expr("_o"))
        quads = staged.select(
            F.xxhash64(_iri_bnode_key(F.col("st"))).alias("s"),
            F.xxhash64(_iri_bnode_key(F.col("pt"))).alias("p"),
            F.xxhash64(_key_from_parts("_o")).alias("o"),
            F.when(
                F.col("lt").isNotNull(),
                F.xxhash64(_iri_bnode_key(F.col("lt"))),
            ).alias("l"),
        )
        terms = (
            term_quads.select(
                F.explode(
                    F.array(F.col("st"), F.col("pt"), F.col("ot"), F.col("lt"))
                ).alias("t")
            )
            .where(F.col("t").isNotNull())
            .distinct()
        )
        nodes = _decompose_terms(terms)
        return cls(spark, nodes, quads)

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        path: str,
        dedup_nodes: bool = False,
        as_of: int | None = None,
    ) -> "GraphStore":
        """``dedup_nodes=True`` collapses duplicate dictionary rows by
        id (summing refcounts) — needed for stores built by streaming
        appends (streaming/ingest.py), where each micro-batch writes
        its own node increment. Batch ``save()`` output is already
        unique, so the default skips the shuffle.

        ``as_of`` = TIME TRAVEL over the delta log: fold only batches
        ``<= as_of`` (``save_deltas`` returns each batch's id, base =
        0), reconstructing the store exactly as it stood after that
        batch — the LSM log is an ordered history, so any past state
        is a prefix fold. ``as_of=0`` is the base alone. History
        ends where compaction folded it into the base:
        ``as_of < folded-through`` raises (those states are no longer
        reconstructable — retention is the compaction cadence, the
        usual lakehouse trade), while ``as_of == folded-through`` is
        the compacted base itself."""
        nodes = spark.read.parquet(f"{path}/nodes")
        if dedup_nodes:
            nodes = nodes.groupBy("id").agg(
                *[
                    F.first(c, ignorenulls=True).alias(c)
                    for c in NODE_SCHEMA.fieldNames()
                    if c not in ("id", "refs")
                ],
                F.sum("refs").cast("int").alias("refs"),
            )
        quads = spark.read.parquet(f"{path}/quads")
        adds = _try_parquet(spark, f"{path}/delta/adds")
        dels = _try_parquet(spark, f"{path}/delta/dels")
        dnodes = _try_parquet(spark, f"{path}/delta/nodes")
        # drop log batches the compaction watermark says are already
        # folded into the base (the crash-between-swap-and-log-delete
        # window; see _FOLDED_MARKER) — re-applying them would
        # duplicate adds and mis-match tombstones against folded rows
        folded = _read_folded_through(spark, path)
        if as_of is not None and as_of < folded:
            raise ValueError(
                f"load(as_of={as_of}): compaction folded the log "
                f"through batch {folded} into the base — earlier "
                f"states are no longer reconstructable (compact() "
                f"cadence = time-travel retention)"
            )
        if folded > 0 or as_of is not None:

            def _slice(df):
                if df is None or "__batch" not in df.columns:
                    # pre-watermark dnodes rows have no batch stamp;
                    # keep them (conservative — they predate any
                    # watermark-writing compaction, hence any as_of)
                    return df
                cond = (
                    F.coalesce(F.col("__batch"), F.lit(1 << 30)) > folded
                )
                if as_of is not None:
                    # unknown-batch rows predate watermarking: keep
                    # (coalesce to 0 — they are older than any as_of)
                    cond = cond & (
                        F.coalesce(F.col("__batch"), F.lit(0)) <= as_of
                    )
                out = df.where(cond)
                return out if out.limit(1).count() > 0 else None

            adds, dels, dnodes = _slice(adds), _slice(dels), _slice(dnodes)
        if adds is not None or dels is not None or dnodes is not None:
            nodes, quads = _merge_delta_log(spark, nodes, quads, adds, dels, dnodes)
        return cls(spark, nodes, quads)

    # ---------------- persistence ----------------

    def save(self, path: str, mode: str = "overwrite") -> None:
        # Predicate-major layout: range partitioning by (p, s) gives the
        # Parquet footer min/max stats the role of the reference's
        # pos/pso indexes — a filter on p prunes whole files.
        fs, jvm = _hadoop_fs(self.spark, path)
        hp = jvm.org.apache.hadoop.fs.Path
        if mode != "overwrite" or not fs.exists(hp(f"{path}/quads")):
            # append, or a fresh path with nothing to clobber:
            # direct write, no swap machinery needed
            self.quads.repartitionByRange("p", "s").write.mode(
                mode
            ).parquet(f"{path}/quads")
            self.nodes.repartition("id").write.mode(mode).parquet(
                f"{path}/nodes"
            )
            return
        # Overwriting an EXISTING store: same *.tmp + rename swap as
        # compact(). A direct overwrite has two crash holes: (a) the
        # quads overwrite destroys the old _folded_through marker
        # before the new watermark lands, so a crash in between
        # leaves a live delta log that the next load() re-applies
        # onto a base that already contains it (duplicate adds under
        # bag semantics, tombstones matching folded rows); (b) a
        # store whose DataFrames are lazy over this same path would
        # read files mid-overwrite. Writing to tmp siblings with the
        # stale-log watermark INSIDE the quads tmp dir makes the
        # watermark swap in atomically with the new base. A crash
        # between the two renames leaves a torn nodes/quads pair —
        # unlike compact() (where the log replays correctly over the
        # old base) the heal here is simply re-running save(): the
        # source of truth is the in-memory store, not the path.
        stale = max(
            _read_folded_through(self.spark, path),
            _log_max_batch(self.spark, path),
        )
        self.quads.repartitionByRange("p", "s").write.mode(
            "overwrite"
        ).parquet(f"{path}/quads.save.tmp")
        self.nodes.repartition("id").write.mode("overwrite").parquet(
            f"{path}/nodes.save.tmp"
        )
        if stale > 0:
            _write_folded_through(
                self.spark, f"{path}/quads.save.tmp", stale
            )
        # quads (carrying the watermark) LAST: once it lands, the
        # stale log is silenced atomically with the new base
        for sub in ("nodes", "quads"):
            tgt = hp(f"{path}/{sub}")
            if fs.exists(tgt) and not fs.delete(tgt, True):
                raise RuntimeError(
                    f"save: could not delete {path}/{sub}; store left "
                    f"on the previous base (recover: remove "
                    f"*.save.tmp and retry)"
                )
            if not fs.rename(hp(f"{path}/{sub}.save.tmp"), tgt):
                raise RuntimeError(
                    f"save: rename of {path}/{sub}.save.tmp failed; "
                    f"recover by re-running save()"
                )
        _fs_delete(self.spark, f"{path}/delta")
        # Re-point the live DataFrames at the swapped files: a store
        # load()ed from this same path holds lazy plans whose file
        # listings name the files the swap just deleted, so any later
        # action on this object would hit FileNotFoundException (or
        # read nothing). Same discipline as IVFIndex.save.
        self.quads = self.spark.read.parquet(f"{path}/quads")
        self.nodes = self.spark.read.parquet(f"{path}/nodes")
        # The compile memo caches whole PLANS built over the pre-swap
        # DataFrames — its "the store is immutable" premise breaks
        # exactly here, and a hit would replay a plan whose file
        # listing names the deleted files. Drop it; the numeric
        # _pred_count_cache and the driver-side _local_index describe
        # the (unchanged) data, not file layout, and stay valid.
        self.__dict__.pop("_compile_cache", None)

    @classmethod
    def save_deltas(
        cls,
        spark: SparkSession,
        path: str,
        add: list[tuple] = (),
        delete: list[tuple] = (),
    ) -> int:
        """Persist one add/delete batch to a saved store as an
        APPEND-ONLY delta log — the incremental counterpart of
        :meth:`save`, mirroring the reference's incremental backend
        writes (kv batch write path graph/kv/indexing.go:409-480; SQL
        upserts graph/sql/database.go) and SURVEY §1.5's
        partition-overwrite parquet mapping, realized LSM-style:

        - ``{path}/delta/adds``  — added quad rows ``(s,p,o,l,__batch)``
        - ``{path}/delta/dels``  — tombstones     ``(s,p,o,l,__batch)``
        - ``{path}/delta/nodes`` — node-dictionary rows for the added
          values, ``refs`` = occurrences in this batch (merged by
          ``sum`` at load, so existing ids become increments and fresh
          ids become inserts — no existence check, no read)

        The write NEVER reads or rewrites base data: every existing
        file under ``{path}/quads`` / ``{path}/nodes`` is left
        byte-identical (test-pinned), and the write cost is O(delta) —
        a daily delta against a 100 TB store costs the delta, not the
        store. ``load()`` folds the log into the returned DataFrames
        lazily; :meth:`compact` folds it into the base files.

        ``__batch`` is a monotone sequence number (base = 0) giving the
        log ApplyDeltas ordering: a tombstone in batch *i* deletes
        every matching copy with batch <= *i* (adds in the same call
        are deleted too, exactly like ``apply_deltas(add, delete)``),
        while a re-add in a later batch survives. Returns the batch id.

        Single-writer, like the reference's embedded backends; the two
        appends are not atomic together (a crash between them leaves a
        batch with adds but no tombstones — re-apply the batch)."""
        # monotone across compactions: the folded-through watermark
        # survives a compact's log delete, so new batches can never
        # reuse an id the watermark already covers
        batch = max(
            1,
            _log_max_batch(spark, path) + 1,
            _read_folded_through(spark, path) + 1,
        )
        if add:
            st = cls.from_quad_values(spark, list(add))
            st.quads.withColumn(
                "__batch", F.lit(batch).cast("int")
            ).write.mode("append").parquet(f"{path}/delta/adds")
            # node rows with per-batch occurrence refs (the same occ
            # accounting as apply_deltas)
            occ: dict[int, int] = {}
            vals: dict[int, Value] = {}
            for dq in add:
                for x in dq:
                    if x is not None:
                        v = coerce(x)
                        vals[v.id] = v
                        occ[v.id] = occ.get(v.id, 0) + 1
            rows = [
                _node_row(vals[i])[:-1] + (occ[i],) for i in sorted(vals)
            ]
            spark.createDataFrame(rows, NODE_SCHEMA).withColumn(
                "__batch", F.lit(batch).cast("int")
            ).write.mode("append").parquet(f"{path}/delta/nodes")
        if delete:
            dst = cls.from_quad_values(spark, list(delete))
            dst.quads.dropDuplicates(["s", "p", "o", "l"]).withColumn(
                "__batch", F.lit(batch).cast("int")
            ).write.mode("append").parquet(f"{path}/delta/dels")
        # marker LAST (after the data lands): history() reads it
        # instead of scanning the log's __batch column
        _write_latest_batch(spark, path, batch)
        return batch

    @classmethod
    def history(
        cls, spark: SparkSession, path: str, exact: bool = False
    ) -> dict:
        """Time-travel metadata for a saved store: which ``as_of``
        values :meth:`load` can reconstruct. Returns
        ``{"folded_through": F, "latest_batch": L}`` — valid ``as_of``
        values are ``F..L`` inclusive (``F`` is the compacted base's
        state; ``L`` is the current head; ``F == L == 0`` means no
        deltas were ever written).

        Default cost is two small metadata reads (the compaction
        watermark + the ``_latest_batch`` marker ``save_deltas``
        writes after each append) — no data scan. The marker is
        written AFTER the batch's parquet lands, so a writer crash in
        that window (or a log written by a pre-marker version) can
        leave ``latest_batch`` one batch low; pass ``exact=True`` to
        aggregate ``max(__batch)`` over the log instead (an O(log)
        column scan — the next ``save_deltas`` also heals the marker,
        since batch numbering always seeds from the scan)."""
        folded = _read_folded_through(spark, path)
        latest = (
            _log_max_batch(spark, path)
            if exact
            else _read_latest_batch(spark, path)
        )
        return {"folded_through": folded, "latest_batch": max(folded, latest)}

    @classmethod
    def compact(
        cls, spark: SparkSession, path: str, dedup_nodes: bool = False
    ) -> "GraphStore":
        """Fold the delta log into the base files: rewrite
        ``{path}/quads`` / ``{path}/nodes`` from the merged view (same
        (p,s) range / id layout as :meth:`save`) and drop the log.
        The reference's backend compaction analog (its kv backends
        inherit LSM compaction from the underlying store).

        Writes to ``*.compact.tmp`` siblings first, then swaps via
        Hadoop FileSystem rename (works on local/HDFS/S3A alike), so
        the source files are never read-while-overwritten. Every
        delete/rename return value is CHECKED (Hadoop FileSystem
        reports failure by returning false, not raising), and the
        folded-through watermark is written INSIDE the quads tmp dir
        so it swaps in atomically with the new base: a crash between
        the swap and the log delete leaves a log that load() ignores
        via the watermark instead of silently re-applying — the
        corruption class a bare staged-rename would have (duplicate
        folded adds, tombstones matching folded re-adds)."""
        folded = max(
            _read_folded_through(spark, path), _log_max_batch(spark, path)
        )
        st = cls.load(spark, path, dedup_nodes=dedup_nodes)
        st.quads.repartitionByRange("p", "s").write.mode(
            "overwrite"
        ).parquet(f"{path}/quads.compact.tmp")
        st.nodes.repartition("id").write.mode("overwrite").parquet(
            f"{path}/nodes.compact.tmp"
        )
        if folded > 0:
            _write_folded_through(
                spark, f"{path}/quads.compact.tmp", folded
            )
        fs, jvm = _hadoop_fs(spark, path)
        hp = jvm.org.apache.hadoop.fs.Path
        # nodes FIRST, quads (carrying the watermark) LAST: a crash
        # between the two renames then leaves new-nodes + old-quads +
        # live log — load() re-folds the log over the old quads
        # (correct membership; at worst re-summed refs, the documented
        # loose counter) and a compact retry heals fully. The reverse
        # order would leave folded quads with a watermark-silenced
        # log and PRE-fold nodes: dictionary entries for the folded
        # adds would be unrecoverable.
        for sub in ("nodes", "quads"):
            tgt = hp(f"{path}/{sub}")
            if fs.exists(tgt) and not fs.delete(tgt, True):
                raise RuntimeError(
                    f"compact: could not delete {path}/{sub}; store left "
                    f"on the pre-compaction base + delta log (recover: "
                    f"remove *.compact.tmp and retry)"
                )
            if not fs.rename(hp(f"{path}/{sub}.compact.tmp"), tgt):
                raise RuntimeError(
                    f"compact: rename of {path}/{sub}.compact.tmp failed; "
                    f"the watermark keeps any surviving delta log "
                    f"unreplayed — recover by retrying the swap"
                )
        dl = hp(f"{path}/delta")
        if fs.exists(dl) and not fs.delete(dl, True):
            raise RuntimeError(
                f"compact: could not delete {path}/delta; SAFE to retry "
                f"— load() ignores the folded batches via the watermark"
            )
        return cls.load(spark, path)

    def persist(self) -> "GraphStore":
        return GraphStore(self.spark, self.nodes.persist(), self.quads.persist())

    def enable_local(self, quad_budget: int | None = None) -> "GraphStore":
        """Adaptive small-store latency mode: collect the store ONCE
        into driver-side hash indexes (the reference memstore's
        architecture, graph/memstore/quadstore.go) and evaluate whole
        queries on the driver — the ~20 ms point-query floor a
        distributed plan cannot reach (every Spark job pays scheduler +
        stage-launch overhead regardless of data size).

        Prices itself out at scale: declines (no-op) when the quad
        count exceeds the budget (default 1M, conf
        ``spark.cayley.local.quadBudget``), so a 100 TB store always
        stays on the distributed engine. Same adaptive pattern as the
        recursion driver-BFS (plans/compiler.py). Opt-in per store;
        deltas return new stores without the index, so a stale local
        index is unreachable."""
        budget = (
            quad_budget
            if quad_budget is not None
            else int(
                self.spark.conf.get("spark.cayley.local.quadBudget", "1000000")
            )
        )
        if budget <= 0:
            return self
        # pricing probe: limit(budget+1).count() can early-stop; no
        # rows move to the driver on the decline path
        if self.quads.limit(budget + 1).count() > budget:
            return self
        from .plans.local import LocalIndex

        self._local_index = LocalIndex.from_store(self)
        return self

    # ---------------- stats (reference graph/quadstore.go:77-88) -----

    def stats(self) -> dict:
        return {
            "nodes": self.nodes.count(),
            "quads": self.quads.count(),
        }

    # ---------------- graph analytics (repo extension) ---------------

    def _edge_frame(self, predicate=None):
        """(src, dst) node-id edges, optionally restricted to one
        predicate — the bridge from the quad store to the whole-graph
        algorithms in graphs/algorithms.py. The predicate constraint
        is a literal pushdown, same as the query compiler's hops."""
        from pyspark.sql import functions as F

        from .values import coerce

        e = self.quads
        if predicate is not None:
            e = e.where(F.col("p") == F.lit(coerce(predicate).id))
        return e.select(F.col("s").alias("src"), F.col("o").alias("dst"))

    def pagerank(self, predicate=None, iters: int = 3):
        """Fixed-point PageRank over the (predicate-filtered) graph.
        Returns (id, term, rank) with the node rendered for the
        caller."""
        from pyspark.sql import functions as F

        from .graphs.algorithms import pagerank as _pr

        ranks = _pr(self._edge_frame(predicate), iters=iters)
        terms = self.nodes.select("id", "term")
        return ranks.join(terms, "id", "left").select(
            "id", "term", F.col("rank")
        )

    def connected_components(self, predicate=None):
        """Undirected connected components over the (predicate-
        filtered) graph: (id, term, component)."""
        from pyspark.sql import functions as F

        from .graphs.algorithms import connected_components as _cc

        comp = _cc(self._edge_frame(predicate))
        terms = self.nodes.select("id", "term")
        return comp.join(terms, "id", "left").select(
            "id", "term", F.col("component")
        )

    def kcore(self, k: int = 2, predicate=None):
        """Vertices of the k-core of the (predicate-filtered) graph:
        (id, term, degree)."""
        from pyspark.sql import functions as F

        from .graphs.algorithms import kcore as _kc

        core = _kc(self._edge_frame(predicate), k=k)
        terms = self.nodes.select("id", "term")
        return core.join(terms, "id", "left").select(
            "id", "term", F.col("degree")
        )

    def predicate_stats(self):
        """Per-predicate quad counts: (predicate term, n_quads) — the
        reference's Stats surface (graph/quadstore.go:77-88) extended
        per predicate, i.e. the statistics a cost-based join-order
        decision keys on (reference query/shape optimizer §4.2). One
        map-side-combined groupBy on the quads table's p column plus
        a dictionary join to render terms; the predicate dictionary
        slice is dimension-sized, so the join broadcasts."""
        from pyspark.sql import functions as F

        counts = self.quads.groupBy("p").agg(
            F.count(F.lit(1)).alias("n_quads")
        )
        terms = self.nodes.select(F.col("id").alias("p"), "term")
        return counts.join(terms, "p", "left").select(
            F.col("term").alias("predicate"), "n_quads"
        )

    def triangle_count(self, predicate=None):
        """Triangle count of the (predicate-filtered) graph treated
        as undirected and simple — 1-row (n_triangles). Multigraph
        storage (parallel/reciprocal predicate edges) is collapsed
        by the algorithm's canonicalization."""
        from .graphs.algorithms import triangles as _tri

        return _tri(self._edge_frame(predicate))

    def random_walks(self, predicate=None, walk_length=4, seed="w"):
        """Deterministic DeepWalk corpus over the (predicate-filtered)
        graph, terms rendered: (walk_term, step, term). Same facade
        shape as pagerank/triangle_count; the hop rule is the seeded
        md5 argmin of graphs/algorithms.random_walks, so the walks
        replay identically on any engine."""
        from pyspark.sql import functions as F

        from .graphs.algorithms import random_walks as _rw

        walks = _rw(
            self._edge_frame(predicate),
            walk_length=walk_length,
            seed=seed,
        )
        terms = self.nodes.select("id", "term")
        return (
            walks.join(
                terms.select(
                    F.col("id").alias("walk_id"),
                    F.col("term").alias("walk_term"),
                ),
                "walk_id",
            )
            .join(
                terms.select(
                    F.col("id").alias("node"), F.col("term").alias("term")
                ),
                "node",
            )
            .select("walk_term", "step", "term")
        )

    # ---------------- write model (reference graph/quadwriter.go) ----

    def apply_deltas(
        self, add: list[tuple] = (), delete: list[tuple] = ()
    ) -> "GraphStore":
        """Batch add/delete of quads → new GraphStore (immutable DFs).
        Mirrors ApplyDeltas (reference graph/quadstore.go:96) with
        refcount maintenance via SplitDeltas semantics
        (graph/log/graphlog.go:79). Duplicate adds are kept (bag
        semantics, per-backend IgnoreDup is an opt-in the caller does
        with dropDuplicates)."""
        out = self
        if add:
            other = GraphStore.from_quad_values(self.spark, list(add))
            # Delta-sized node merge: the added values' ids are known
            # driver-side, so finding which already exist is one scan
            # with a literal isin predicate (no whole-table groupBy —
            # the previous union+groupBy shuffled every node row per
            # write batch). Existing nodes get a broadcast refcount
            # increment; genuinely new rows are unioned in.
            add_vals: dict[int, Value] = {}
            for dq in add:
                for x in dq:
                    if x is not None:
                        v = coerce(x)
                        add_vals[v.id] = v
            new_ids = sorted(add_vals)
            existing = {
                r["id"]
                for r in out.nodes.where(F.col("id").isin(new_ids))
                .select("id")
                .collect()
            }
            # per-id occurrence count across directions of added quads
            occ: dict[int, int] = {}
            for dq in add:
                for x in dq:
                    if x is not None:
                        occ[coerce(x).id] = occ.get(coerce(x).id, 0) + 1
            incs = self.spark.createDataFrame(
                [(i, occ[i]) for i in new_ids if i in existing] or [(0, 0)],
                "id long, __inc int",
            )
            merged_nodes = (
                out.nodes.join(F.broadcast(incs), "id", "left")
                .withColumn(
                    "refs",
                    (
                        F.col("refs") + F.coalesce(F.col("__inc"), F.lit(0))
                    ).cast("int"),
                )
                .drop("__inc")
            )
            fresh_rows = [
                _node_row(add_vals[i])[:-1] + (occ[i],)
                for i in new_ids
                if i not in existing
            ]
            if fresh_rows:
                merged_nodes = merged_nodes.unionByName(
                    self.spark.createDataFrame(fresh_rows, NODE_SCHEMA)
                )
            # The select() before the union is a cache barrier, not a
            # no-op: Dataset.union flattens nested Unions EAGERLY
            # (CombineUnions at Dataset-build time), so when
            # self.quads is a persisted union (tpch_graph's 11-branch
            # edge union, or any unioned store), the flattened plan no
            # longer contains a subtree equal to the cached plan and
            # CacheManager.useCachedData silently stops substituting —
            # every downstream reference of the delta store then
            # re-derives the whole quad table from the base relations
            # (measured: g_write_delete re-ran the 11-branch build as
            # 200+-task stages per reference, ~7.5 s vs ~1 s cached at
            # sf0.1). A Project above the cached frame blocks the
            # flattening while remaining transparent to the optimizer.
            out = GraphStore(
                self.spark,
                merged_nodes,
                out.quads.select("s", "p", "o", "l").unionByName(
                    other.quads
                ),
            )
        if delete:
            dels = GraphStore.from_quad_values(self.spark, list(delete))
            # Delete the exact 4-tuple including label — the reference
            # resolves all four directions (graph/memstore/quadstore.go:
            # 396-402 findQuad; SQL uniqueness is per (s,p,o,l),
            # graph/sql/database.go:103-110). In a multigraph, deleting
            # the unlabeled triple must NOT touch labeled variants, so
            # the label compares null-safely. Note: a delete removes
            # every duplicate copy of the matching quad (anti-join), not
            # one instance per delta — callers needing per-instance bag
            # deletion should dedup adds first.
            q, d = out.quads.alias("q"), dels.quads.alias("d")
            match = (
                (F.col("q.s") == F.col("d.s"))
                & (F.col("q.p") == F.col("d.p"))
                & (F.col("q.o") == F.col("d.o"))
                & F.col("q.l").eqNullSafe(F.col("d.l"))
            )
            remaining = q.join(F.broadcast(d), on=match, how="left_anti")
            # Orphan detection is DELTA-SIZED, not table-sized: only
            # nodes named by the deleted quads can become orphans, and
            # those ids are known driver-side. One scan of the
            # surviving quads with a literal isin predicate (Parquet /
            # cached-batch pruning applies) finds which candidates are
            # still referenced — no whole-table explode+groupBy, which
            # the previous full refcount recompute paid per delete.
            cand_ids = sorted(
                {
                    v.id
                    for quad_vals in (
                        tuple(coerce(x) if x is not None else None for x in dq)
                        for dq in delete
                    )
                    for v in quad_vals
                    if v is not None
                }
            )
            cond = None
            for dr in DIRS:
                c = F.col(dr).isin(cand_ids)
                cond = c if cond is None else (cond | c)
            used_cand = (
                remaining.where(cond)
                .select(
                    F.explode(
                        F.array(*[F.col(dr) for dr in DIRS])
                    ).alias("id")
                )
                .where(F.col("id").isin(cand_ids))
                .distinct()
            )
            drop_df = self.spark.createDataFrame(
                [(i,) for i in cand_ids], "id long"
            ).join(used_cand, "id", "left_anti")
            # refs accounting: decrement by occurrences in the removed
            # rows (tiny aggregate over the matched quads only)
            removed = q.join(F.broadcast(d), on=match, how="left_semi")
            dec = None
            for dr in DIRS:
                u = removed.select(F.col(dr).alias("id")).where(
                    F.col("id").isNotNull()
                )
                dec = u if dec is None else dec.unionAll(u)
            decs = dec.groupBy("id").agg(
                F.count(F.lit(1)).cast("int").alias("__dec")
            )
            nodes = (
                out.nodes.join(F.broadcast(decs), "id", "left")
                .withColumn(
                    "refs",
                    F.greatest(
                        (
                            F.col("refs") - F.coalesce(F.col("__dec"), F.lit(0))
                        ).cast("int"),
                        F.lit(1),
                    ),
                )
                .drop("__dec")
            )
            nodes = nodes.join(F.broadcast(drop_df), "id", "left_anti")
            out = GraphStore(self.spark, nodes, remaining)
        return out

    def remove_node(self, value) -> "GraphStore":
        """Delete a node and every quad incident to it in any
        direction (reference writer/single.go:84-113 RemoveNode: three
        g.V(v).Mutate() delete paths — subject, object, label; the
        predicate direction is included here for symmetry with the
        reference's all-directions QuadIterator contract)."""
        vid = coerce(value).id
        cond = None
        for d in DIRS:
            c = F.col(d) == F.lit(vid)
            cond = c if cond is None else (cond | c)
        remaining = self.quads.where(~F.coalesce(cond, F.lit(False)))
        used = None
        for d in DIRS:
            u = remaining.select(F.col(d).alias("id")).where(
                F.col("id").isNotNull()
            )
            used = u if used is None else used.unionAll(u)
        refc = used.groupBy("id").agg(F.count("*").cast("int").alias("refs"))
        nodes = self.nodes.drop("refs").join(refc, "id", "inner")
        return GraphStore(self.spark, nodes, remaining)

    def dedup_bnodes(
        self, type_pred=None, type_value=None
    ) -> "GraphStore":
        """Merge blank nodes whose outgoing edge sets are identical
        (reference cmd/cayley/command/dedup.go:32-33: bnodes deduped by
        a content hash of their properties). ``type_pred``/
        ``type_value`` restrict candidates to bnodes carrying that
        type edge — the reference CLI's --pred/--type contract
        (dedup.go NewDedupCommand). Distributed: hash each bnode's
        sorted (p,o) set, pick the min-id representative per hash,
        remap s/o/l through the representative map."""
        bn = self.nodes.where(F.col("kind") == "bnode").select("id")
        if type_value is not None:
            cond = F.col("o") == F.lit(coerce(type_value).id)
            if type_pred is not None:
                cond = cond & (F.col("p") == F.lit(coerce(type_pred).id))
            typed = self.quads.where(cond).select(F.col("s").alias("id"))
            bn = bn.join(typed, "id", "left_semi")
        sig = (
            self.quads.join(bn.withColumnRenamed("id", "s"), "s", "left_semi")
            .groupBy("s")
            .agg(
                F.xxhash64(
                    F.concat_ws(
                        "|",
                        F.sort_array(
                            F.collect_list(F.concat_ws(":", "p", "o"))
                        ),
                    )
                ).alias("sig")
            )
        )
        rep = sig.groupBy("sig").agg(F.min("s").alias("rep"))
        remap = (
            sig.join(rep, "sig")
            .where(F.col("s") != F.col("rep"))
            .select(F.col("s").alias("old"), F.col("rep").alias("new"))
        )
        q = self.quads
        for d in DIRS:
            m = remap.withColumnRenamed("old", d)
            q = (
                q.join(F.broadcast(m), d, "left")
                .withColumn(d, F.coalesce(F.col("new"), F.col(d)))
                .drop("new")
            )
        q = q.dropDuplicates(["s", "p", "o", "l"])
        dropped = remap.select(F.col("old").alias("id"))
        nodes = self.nodes.join(dropped, "id", "left_anti")
        return GraphStore(self.spark, nodes, q)

    # ---------------- rendering ----------------

    def resolve(self, df: DataFrame, cols: list[str] | None = None) -> DataFrame:
        """Replace node-id columns with their N-Quads term strings.

        Narrow results (<=2 id columns) use one dictionary join per
        column — broadcast when the dictionary is small, so zero
        shuffles on the cached local store. Wider results melt the id
        columns once, join the dictionary ONCE, and pivot back: at
        scale a k-tag result then pays one dictionary shuffle join
        (on k× melted rows) + one pivot instead of k full shuffle
        joins of the nodes table."""
        if cols is None:
            # node ids are LongType; non-long columns (depth tags,
            # counts carried alongside) pass through unresolved
            cols = [
                f.name
                for f in df.schema.fields
                if not f.name.startswith("__")
                and f.dataType.typeName() == "long"
            ]
        if not cols:
            return df
        lt = getattr(df, "_cayley_local", None)
        if lt is not None and getattr(self, "_local_index", None) is not None:
            # local-engine result: render terms from the driver-side
            # dictionary — zero Spark jobs
            from .plans.local import resolve_local

            return resolve_local(self, df, lt, cols)
        terms = self.nodes.select("id", "term")
        if len(cols) <= 2:
            out = df
            for c in cols:
                t = terms.withColumnRenamed("id", f"__{c}_id").withColumnRenamed(
                    "term", f"__{c}_term"
                )
                out = (
                    out.join(
                        t,
                        F.col("`" + c + "`") == F.col("`__" + c + "_id`"),
                        "left",
                    )
                    .drop(c, f"__{c}_id")
                    .withColumnRenamed(f"__{c}_term", c)
                )
            return out.select(*[F.col("`" + c + "`") for c in df.columns])
        rid = "__resolve_rid"
        # The rid column must be IDENTICAL on both sides of the
        # join-back below. monotonically_increasing_id() is
        # re-evaluated per use and row order is not stable across
        # re-evaluations (shuffles, AQE), so the rid-stamped result is
        # materialized once (lazy localCheckpoint: the first action
        # computes and stores the blocks both branches then share).
        out = df.withColumn(
            rid, F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
        melted = out.select(
            rid,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("__col"),
                            F.col("`" + c + "`").alias("id"),
                        )
                        for c in cols
                    ]
                )
            ).alias("kv"),
        ).select(rid, F.col("kv.__col").alias("__col"), F.col("kv.id").alias("id"))
        wide = (
            melted.join(terms, "id", "left")
            .groupBy(rid)
            .pivot("__col", cols)
            .agg(F.first("term"))
        )
        out = out.drop(*cols).join(wide, rid, "inner").drop(rid)
        return out.select(*[F.col("`" + c + "`") for c in df.columns])


# ---------------- JVM-side term decomposition ----------------

_IRI_RE = r"^<(.*)>$"
_BNODE_RE = r"^_:(.*)$"
# literal body with escapes, then optional @lang or ^^<dt>
_LIT_RE = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9\-]+)|\^\^<([^>]*)>)?$'


def _unescape_col(c):
    # Handle the standard N-Quads escapes in an order-safe way: first
    # swap escaped backslashes for a sentinel (a raw NUL byte cannot
    # occur inside an N-Quads literal), then decode the
    # single-char escapes, then restore the sentinel. This makes the
    # distributed path agree with the driver-side parser on inputs like
    # "\\t" (backslash + t, not TAB).
    c = F.regexp_replace(c, r"\\\\", "\x00")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r'\\"', '"')
    c = F.regexp_replace(c, "\x00", "\\\\")
    return c


def _iri_bnode_key(term):
    """Hash key for positions the N-Quads grammar restricts to
    IRI|bnode — plain substring ops, no regex."""
    return (
        F.when(
            term.startswith("<"),
            F.concat(F.lit("I:"), F.substring(term, F.lit(2), F.length(term) - 2)),
        )
        .when(
            term.startswith("_:"),
            F.concat(F.lit("B:"), F.substring(term, F.lit(3), F.length(term))),
        )
        .otherwise(F.concat(F.lit("R:"), term))
    )


def _parts(term, sfx: str = ""):
    """Stage-1 extraction: each regex runs exactly once; downstream
    stages reference these by alias so generated code stays small."""
    return [
        term.alias(f"__t{sfx}"),
        F.regexp_extract(term, _IRI_RE, 1).alias(f"__iri{sfx}"),
        F.regexp_extract(term, _BNODE_RE, 1).alias(f"__bn{sfx}"),
        _unescape_col(F.regexp_extract(term, _LIT_RE, 1)).alias(f"__body{sfx}"),
        F.regexp_extract(term, _LIT_RE, 2).alias(f"__lang{sfx}"),
        F.regexp_extract(term, _LIT_RE, 3).alias(f"__dt{sfx}"),
    ]


def _kind_expr(sfx: str = ""):
    t, dt, lang = F.col(f"__t{sfx}"), F.col(f"__dt{sfx}"), F.col(f"__lang{sfx}")
    is_lit = t.startswith('"')
    return (
        F.when(t.startswith("<"), F.lit("iri"))
        .when(t.startswith("_:"), F.lit("bnode"))
        .when(is_lit & (dt == F.lit(XSD + "integer")), F.lit("int"))
        .when(is_lit & (dt == F.lit(XSD + "double")), F.lit("float"))
        .when(is_lit & (dt == F.lit(XSD + "boolean")), F.lit("bool"))
        .when(is_lit & (dt == F.lit(XSD + "dateTime")), F.lit("time"))
        .when(is_lit & (dt != F.lit("")), F.lit("typed_string"))
        .when(is_lit & (lang != F.lit("")), F.lit("lang_string"))
        .when(is_lit, F.lit("string"))
        .otherwise(F.lit("raw"))
    )


def _key_from_parts(sfx: str = ""):
    """Canonical hash key from stage-1 part columns + __kind
    (must agree with values.Value.key())."""
    t, body = F.col(f"__t{sfx}"), F.col(f"__body{sfx}")
    lang, dt = F.col(f"__lang{sfx}"), F.col(f"__dt{sfx}")
    kind = F.col(f"__kind{sfx}")
    return (
        F.when(kind == "iri", F.concat(F.lit("I:"), F.col(f"__iri{sfx}")))
        .when(kind == "bnode", F.concat(F.lit("B:"), F.col(f"__bn{sfx}")))
        .when(kind == "int", F.concat(F.lit("i:"), body.cast("long").cast("string")))
        .when(kind == "float", F.concat(F.lit("f:"), body.cast("double").cast("string")))
        .when(kind == "bool", F.concat(F.lit("b:"), body))
        .when(kind == "time", F.concat(F.lit("t:"), body.cast("timestamp").cast("string")))
        .when(kind == "typed_string", F.concat(F.lit("T:"), dt, F.lit(":"), body))
        .when(kind == "lang_string", F.concat(F.lit("L:"), lang, F.lit(":"), body))
        .when(kind == "string", F.concat(F.lit("S:"), body))
        .when(t.isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("R:"), t))
    )


def _decompose_terms(terms: DataFrame) -> DataFrame:
    """DataFrame[t: string] of distinct N-Quads terms → nodes table.
    Cascaded selects; each intermediate column is computed once
    (CollapseProject keeps multi-referenced non-cheap aliases)."""
    staged = terms.select(*_parts(F.col("t")))
    staged = staged.withColumn("__kind", _kind_expr())
    kind = F.col("__kind")
    body = F.col("__body")
    return staged.select(
        F.xxhash64(_key_from_parts()).alias("id"),
        kind.alias("kind"),
        F.col("__t").alias("term"),
        F.when(kind == "iri", F.col("__iri"))
        .when(kind == "bnode", F.col("__bn"))
        .when(kind.isin("string", "lang_string", "typed_string"), body)
        .when(kind == "raw", F.col("__t"))
        .alias("str"),
        F.when(kind == "lang_string", F.col("__lang")).alias("lang"),
        F.when(kind == "typed_string", F.col("__dt")).alias("datatype"),
        F.when(kind == "int", body.cast("long")).alias("i64"),
        F.when(kind == "float", body.cast("double")).alias("f64"),
        F.when(kind == "bool", body == "true").alias("bool"),
        F.when(kind == "time", body.cast("timestamp")).alias("ts"),
        F.lit(1).alias("refs"),
    )


# ---------------- delta-log persistence helpers ----------------


def _try_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet dir, or None if it does not exist (any Hadoop
    filesystem — the probe is the read itself, not an os.path check).
    mergeSchema: delta/nodes dirs can mix pre- and post-__batch
    schemas across appends; the union schema must surface the column
    with nulls for old files, not drop it footer-lottery style."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.option("mergeSchema", "true").parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


# Compaction watermark: a tiny ``_folded_through`` file inside
# ``{path}/quads`` (underscore-prefixed, so parquet readers ignore it)
# recording the highest delta-log batch id folded into the base.
# It rides the compact swap INSIDE the quads rename — so a crash
# between the swap and the log delete leaves a log whose folded
# batches are ignored by load() instead of silently re-applied
# (duplicate adds under bag semantics, tombstones matching folded
# re-adds). Batch numbering stays monotone across compactions because
# save_deltas seeds from the watermark too.
_FOLDED_MARKER = "_folded_through"


def _read_folded_through(spark: SparkSession, path: str) -> int:
    fs, jvm = _hadoop_fs(spark, path)
    hp = jvm.org.apache.hadoop.fs.Path(f"{path}/quads/{_FOLDED_MARKER}")
    if not fs.exists(hp):
        return 0
    stream = fs.open(hp)
    try:
        line = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        ).readLine()
    finally:
        stream.close()
    try:
        return int((line or "0").strip())
    except ValueError:
        return 0


def _write_folded_through(
    spark: SparkSession, quads_dir: str, value: int
) -> None:
    fs, jvm = _hadoop_fs(spark, quads_dir)
    hp = jvm.org.apache.hadoop.fs.Path(f"{quads_dir}/{_FOLDED_MARKER}")
    out = fs.create(hp, True)
    try:
        out.write(bytearray(str(int(value)).encode("utf-8")))
    finally:
        out.close()


# Latest-batch marker (ADVICE r14): a one-line file under the delta
# log recording the id of the last batch save_deltas appended, so
# history() answers from metadata instead of max(__batch) over the
# log's data files. Written AFTER the batch's parquet lands (a crash
# between the two leaves it one low — the documented history()
# staleness window); lives INSIDE {path}/delta so compact's log
# delete clears it together with the batches it describes.
_LATEST_MARKER = "_latest_batch"


def _read_latest_batch(spark: SparkSession, path: str) -> int:
    fs, jvm = _hadoop_fs(spark, path)
    hp = jvm.org.apache.hadoop.fs.Path(f"{path}/delta/{_LATEST_MARKER}")
    if not fs.exists(hp):
        # no marker: pre-marker log (or none) — fall back to the scan
        # so history() stays correct on stores written by older code
        return _log_max_batch(spark, path)
    try:
        stream = fs.open(hp)
        try:
            line = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8")
            ).readLine()
        finally:
            stream.close()
        return int((line or "0").strip())
    except Exception:
        # unreadable marker (torn write, checksum mismatch, garbage
        # content) — the scan is always authoritative, and the next
        # save_deltas rewrites the marker from it
        return _log_max_batch(spark, path)


def _write_latest_batch(
    spark: SparkSession, path: str, value: int
) -> None:
    fs, jvm = _hadoop_fs(spark, path)
    hp = jvm.org.apache.hadoop.fs.Path(f"{path}/delta/{_LATEST_MARKER}")
    out = fs.create(hp, True)
    try:
        out.write(bytearray(str(int(value)).encode("utf-8")))
    finally:
        out.close()


def _log_max_batch(spark: SparkSession, path: str) -> int:
    mx = 0
    for sub in ("adds", "dels"):
        df = _try_parquet(spark, f"{path}/delta/{sub}")
        if df is not None and "__batch" in df.columns:
            v = df.agg(F.max("__batch")).collect()[0][0]
            mx = max(mx, int(v or 0))
    return mx


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, jvm) for ``path`` via the JVM gateway — the
    FS-portable way to delete/rename store directories (local, HDFS,
    S3A) without shelling out or assuming a local filesystem."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, jvm


def _fs_delete(spark: SparkSession, path: str) -> None:
    fs, jvm = _hadoop_fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(path), True)


def _merge_delta_log(
    spark: SparkSession,
    base_nodes: DataFrame,
    base_quads: DataFrame,
    adds: DataFrame | None,
    dels: DataFrame | None,
    dnodes: DataFrame | None,
) -> tuple[DataFrame, DataFrame]:
    """Fold a ``save_deltas`` log into (nodes, quads) DataFrames —
    the read side of the LSM split. Semantics are exactly
    ``apply_deltas`` replayed in batch order (differential-tested):

    - quads: base (batch 0) ∪ adds, minus every copy matched by a
      tombstone of an equal-or-later batch (null-safe on the label,
      bag semantics — all duplicate copies of a matched quad go);
    - nodes: touched dictionary rows merge by id (first non-null
      attribute, summed refs — an existing id becomes an increment, a
      fresh id an insert), tombstone-named refs decrement by removed
      occurrences, and a tombstone-named id whose value no longer
      appears in any surviving quad is dropped (the delta-sized
      orphan rule). refs divergence, documented: apply_deltas clamps
      refs at 1 per BATCH while this merge sums the whole log and
      clamps ONCE, so a delete-then-readd sequence can land a lower
      (never <1) refs value. refs is a loose refcount either way
      (base rows all write 1) and nothing outside store bookkeeping
      reads it — dictionary MEMBERSHIP, which queries do see, is
      exactly apply_deltas'.

    Scale shape: the merge tax is bounded by the log, not the store.
    Tombstones/decrements/orphan candidates are log-sized and
    broadcast; surviving-quad usage probes carry literal `isin`
    predicates so Parquet footer stats prune the (p,s)-ranged base
    files. The nodes merge splits on a collected touched-id set
    (conf ``spark.cayley.delta.touchedIdsBudget``, default 100k): the
    untouched 100-TB remainder passes through as a NARROW filter (no
    shuffle); only the touched sliver shuffles. Past the budget it
    declines to one full groupBy(id) — loudly the compaction signal."""
    if dnodes is not None and "__batch" in dnodes.columns:
        # batch stamp is the load()-side watermark filter's business;
        # the merge itself is batch-agnostic for node rows
        dnodes = dnodes.drop("__batch")
    q_all = base_quads.withColumn("__batch", F.lit(0).cast("int"))
    if adds is not None:
        q_all = q_all.unionByName(adds.select(*q_all.columns))

    removed = None
    if dels is not None:
        d = dels.select(
            F.col("s").alias("__ds"),
            F.col("p").alias("__dp"),
            F.col("o").alias("__do"),
            F.col("l").alias("__dl"),
            F.col("__batch").alias("__db"),
        )
        cond = (
            (F.col("s") == F.col("__ds"))
            & (F.col("p") == F.col("__dp"))
            & (F.col("o") == F.col("__do"))
            & F.col("l").eqNullSafe(F.col("__dl"))
            & (F.col("__db") >= F.col("__batch"))
        )
        db = F.broadcast(d)
        removed = q_all.join(db, cond, "left_semi")
        q_surv = q_all.join(db, cond, "left_anti")
    else:
        q_surv = q_all
    quads_out = q_surv.drop("__batch")

    attr_cols = [
        c for c in NODE_SCHEMA.fieldNames() if c not in ("id", "refs")
    ]

    def _merge_rows(df: DataFrame) -> DataFrame:
        return df.groupBy("id").agg(
            *[F.first(c, ignorenulls=True).alias(c) for c in attr_cols],
            F.sum("refs").cast("int").alias("refs"),
        )

    # ids whose dictionary row can change: added values + tombstone-
    # named values. The log is small by design; probe with an
    # early-stopping limit so the decline path never collects.
    budget = int(
        spark.conf.get("spark.cayley.delta.touchedIdsBudget", "100000")
    )
    pieces = []
    if dnodes is not None:
        pieces.append(dnodes.select("id"))
    cand_df = None
    if dels is not None:
        cand_df = (
            dels.select(
                F.explode(F.array(*[F.col(c) for c in DIRS])).alias("id")
            )
            .where(F.col("id").isNotNull())
            .distinct()
        )
        pieces.append(cand_df)
    if not pieces:
        return base_nodes, quads_out
    touched_df = pieces[0]
    for p in pieces[1:]:
        touched_df = touched_df.unionByName(p)
    touched_df = touched_df.distinct()
    touched_ids: list[int] | None = None
    if touched_df.limit(budget + 1).count() <= budget:
        touched_ids = sorted(r["id"] for r in touched_df.collect())
    if touched_ids == []:
        return base_nodes, quads_out

    # refs decrements: occurrences in the removed copies (delta-sized
    # — bounded by copies of tombstoned quads)
    dec = None
    if removed is not None:
        dec = (
            removed.select(
                F.explode(F.array(*[F.col(c) for c in DIRS])).alias("id")
            )
            .where(F.col("id").isNotNull())
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("int").alias("__dec"))
        )

    if touched_ids is not None:
        untouched = base_nodes.where(~F.col("id").isin(touched_ids))
        tb = base_nodes.where(F.col("id").isin(touched_ids))
        merged = _merge_rows(
            tb.unionByName(dnodes) if dnodes is not None else tb
        )
    else:
        untouched = None
        merged = _merge_rows(
            base_nodes.unionByName(dnodes)
            if dnodes is not None
            else base_nodes
        )
    if dec is not None:
        dec_b = F.broadcast(dec) if touched_ids is not None else dec
        merged = (
            merged.join(dec_b, "id", "left")
            .withColumn(
                "refs",
                F.greatest(
                    (
                        F.col("refs") - F.coalesce(F.col("__dec"), F.lit(0))
                    ).cast("int"),
                    F.lit(1),
                ),
            )
            .drop("__dec")
        )
    if cand_df is not None:
        # orphan rule: tombstone-named ids unused by surviving quads
        # go. The usage probe carries a literal isin when the touched
        # set collected (file pruning on the ranged base); otherwise a
        # distributed semi-join.
        if touched_ids is not None:
            cand_ids = sorted(
                r["id"] for r in cand_df.collect()
            )
            ucond = None
            for dr in DIRS:
                c = F.col(dr).isin(cand_ids)
                ucond = c if ucond is None else (ucond | c)
            used = (
                q_surv.where(ucond)
                .select(
                    F.explode(
                        F.array(*[F.col(c) for c in DIRS])
                    ).alias("id")
                )
                .where(F.col("id").isin(cand_ids))
                .distinct()
            )
        else:
            used = (
                q_surv.select(
                    F.explode(
                        F.array(*[F.col(c) for c in DIRS])
                    ).alias("id")
                )
                .where(F.col("id").isNotNull())
                .join(cand_df, "id", "left_semi")
                .distinct()
            )
        drop_df = cand_df.join(used, "id", "left_anti")
        drop_b = F.broadcast(drop_df) if touched_ids is not None else drop_df
        merged = merged.join(drop_b, "id", "left_anti")
    nodes_out = (
        untouched.unionByName(merged) if untouched is not None else merged
    )
    return nodes_out, quads_out

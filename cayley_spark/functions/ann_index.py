"""Persisted IVF ANN index: build once, save as partitioned Parquet,
query forever.

``similarity.ivf_topk`` recomputes centroids + bucketing per call —
right for a one-shot oracle-checked query, wrong for a serving
pattern where one corpus answers many queries. ``IVFIndex`` splits
the lifecycle:

- ``build``: Lloyd centroids (decimal-exact, same kernel as
  ivf_topk) + one pass assigning every vector to its nearest
  centroid.
- ``save``/``load``: the bucketed table is written
  ``partitionBy("c")`` — one Parquet directory per inverted list —
  and the centroid matrix rides along as a 1-row Parquet sidecar
  table (written via Spark's writer, so any Hadoop FS works).
- ``query``: probes the ``nprobe`` nearest centroids per query
  vector driver-side (centroid count is small by construction), then
  scans ONLY those buckets: the ``c IN (...)`` predicate prunes at
  the PARTITION level, so a query over a 100 TB index reads
  ~nprobe/n_centroids of the files — the Parquet-native equivalent
  of an inverted-list seek, with zero custom storage code.

Scale notes: bucket skew follows cluster sizes; rebalance by raising
n_centroids (lists shrink linearly). The probe set is a broadcast;
scoring is one scan of the probed lists + a per-query top-k window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import _nearest, cosine, kmeans_centroids


def _swap_dir(spark: SparkSession, path: str, sub: str) -> None:
    """Swap ``{path}/{sub}.save.tmp`` into ``{path}/{sub}`` via Hadoop
    FileSystem rename-aside (portable across local/HDFS/S3A). Return
    values are CHECKED — Hadoop reports failure by returning false.

    Ordering: target → target.old, tmp → target, delete target.old.
    The window in which the target does not exist is the gap between
    the two renames (metadata ops), not the duration of a recursive
    delete — the old delete-then-rename ordering left concurrent
    readers (which streaming/sketches.py explicitly allows) a
    delete-sized hole. A crash between the renames leaves ``.old`` as
    the ONLY copy of the accumulated state; the entry guard below
    (and ``_recover_swap``, which state readers call before their
    first read) rename it back rather than deleting it — ``.old`` is
    deletable junk only when the target also exists. True atomicity
    holds only on rename-atomic filesystems (HDFS, local POSIX); on
    S3A rename is a non-atomic copy, so concurrent readers there can
    still observe a missing or partial target — front S3 swaps with a
    table format or a manifest if readers cannot tolerate that."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hp = jvm.org.apache.hadoop.fs.Path
    fs = hp(path).getFileSystem(sc._jsc.hadoopConfiguration())
    tgt = hp(os.path.join(path, sub))
    old = hp(os.path.join(path, f"{sub}.old"))
    if fs.exists(old):
        if not fs.exists(tgt):
            # crash landed between the two renames of a previous
            # swap: restore the set-aside state instead of deleting
            # the only copy (permanent sketch under-count otherwise)
            if not fs.rename(old, tgt):
                raise RuntimeError(
                    f"swap: could not restore {path}/{sub}.old to "
                    f"{path}/{sub} (crash-recovery); fix up manually"
                )
        elif not fs.delete(old, True):
            raise RuntimeError(
                f"swap: could not clear stale {path}/{sub}.old; previous "
                f"layout left intact (remove it and retry)"
            )
    had_old = fs.exists(tgt)
    if had_old and not fs.rename(tgt, old):
        raise RuntimeError(
            f"swap: could not set aside {path}/{sub}; previous layout "
            f"left intact (recover: remove *.save.tmp and retry)"
        )
    if not fs.rename(hp(os.path.join(path, f"{sub}.save.tmp")), tgt):
        if had_old:
            fs.rename(old, tgt)  # best-effort restore of the old dir
        raise RuntimeError(
            f"swap: rename of {path}/{sub}.save.tmp failed; retry"
        )
    if had_old:
        # cleanup only — target is already correct; a failed delete
        # leaves junk that the next swap's entry guard clears
        fs.delete(old, True)


def _stamp_token(spark: SparkSession, data_dir: str, token: str) -> None:
    """Write ``token`` into ``{data_dir}/_token`` (underscore prefix:
    parquet readers skip it). Called on a STAGED tmp dir before its
    swap, so the stamp and the data move together atomically; the
    sidecar written after the swap echoes the token, and
    :func:`_check_token` turns the crash window between the two
    writes (new data paired with a STALE sidecar — silently wrong
    parameters/centroids) into a loud load-time error."""
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(data_dir).getFileSystem(sc._jsc.hadoopConfiguration())
    out = fs.create(hp(os.path.join(data_dir, "_token")), True)
    try:
        out.write(bytearray(token.encode("ascii")))
    finally:
        out.close()


def _read_token(spark: SparkSession, data_dir: str):
    """The ``_token`` stamp of a data dir, or None for pre-token
    layouts (legacy saves, streaming folds that write partitions
    directly)."""
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(data_dir).getFileSystem(sc._jsc.hadoopConfiguration())
    p = hp(os.path.join(data_dir, "_token"))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # byte-at-a-time: py4j copies (never mutates) Python
        # bytearrays passed to Java read(byte[]), so the buffered
        # form silently returns zeros; the token is 32 bytes
        out = []
        while len(out) < 256:
            b = stream.read()
            if b < 0:
                break
            out.append(b)
        return bytes(out).decode("ascii")
    finally:
        stream.close()


def _check_token(spark: SparkSession, data_dir: str, meta_token) -> None:
    """Raise when a data dir's stamp and its sidecar's echoed token
    disagree — the signature of a save() that crashed after swapping
    the data but before rewriting the sidecar. A stale sidecar is
    SILENTLY wrong (different k / shingling / centroids change the
    semantics of every later admission or probe), so loads must fail
    loudly instead. Both absent = legacy layout, accepted."""
    data_token = _read_token(spark, data_dir)
    if data_token is None and meta_token is None:
        return
    if data_token != meta_token:
        raise RuntimeError(
            f"{data_dir}: data stamp {data_token!r} does not match "
            f"sidecar token {meta_token!r} — a save() crashed between "
            "swapping the data and rewriting the sidecar, so the "
            "sidecar's parameters are stale. Re-run save() with the "
            "original parameters (or rebuild the index)."
        )


def _recover_swap(spark: SparkSession, path: str, sub: str) -> None:
    """Recover from a crash that landed between ``_swap_dir``'s two
    renames: the target ``{path}/{sub}`` is absent and ``{sub}.old``
    holds the only copy of the state that was set aside — rename it
    back. Callers that fold new data into persisted state (the
    streaming sketch folds) MUST call this before probing the target:
    otherwise the probe reads 'absent', the fold treats the batch as
    the first one, and the accumulated sketch is silently replaced by
    the batch's own — a permanent Count-Min under-count / bloom false
    negative. No-op when the target exists or there is no ``.old``."""
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path
    fs = hp(path).getFileSystem(sc._jsc.hadoopConfiguration())
    tgt = hp(os.path.join(path, sub))
    old = hp(os.path.join(path, f"{sub}.old"))
    if fs.exists(old) and not fs.exists(tgt):
        if not fs.rename(old, tgt):
            raise RuntimeError(
                f"recover: could not restore {path}/{sub}.old to "
                f"{path}/{sub}; fix up manually"
            )


class IVFIndex:
    def __init__(self, spark: SparkSession, centroids: list[list[float]], bucketed: DataFrame):
        self.spark = spark
        self.centroids = centroids
        self.bucketed = bucketed  # (id long, v array<double>, c int)
        # True while self.bucketed holds rows that exist ONLY in
        # memory relative to a saved layout (add(path=None) after a
        # save/load): add(path=...) re-reads the files, which would
        # silently drop those rows — the centroid-equality guard
        # cannot catch it because centroids match. save() clears it.
        self._has_unsaved = False

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_centroids: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        iters: int = 2,
    ) -> "IVFIndex":
        cents = kmeans_centroids(
            df, n_centroids, id_col=id_col, vec_col=vec_col, iters=iters
        )
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        bucketed = base.withColumn("c", _nearest(F.col("v"), cents))
        return cls(df.sparkSession, cents, bucketed)

    def add(
        self,
        df: DataFrame,
        path: str | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        """Incremental insert: assign new vectors to the FROZEN
        centroid set and append them to their inverted lists.  With
        ``path``, the delta is written ``mode("append")`` into the
        saved ``buckets`` layout — append-only and partition-targeted,
        so every pre-existing bucket file stays byte-identical and
        only the buckets that actually receive vectors gain new files
        (a daily embedding batch against a 100-TB index writes
        delta-sized output, never a rebuild; the same discipline as
        GraphStore.save_deltas).  Standard IVF caveats apply and are
        the caller's contract: centroids are not retrained (rebuild
        when drift/imbalance grows — monitor via bucket_counts), and
        id uniqueness across batches is the caller's responsibility.

        Reference parity: the reference's kv backends apply writes as
        incremental batch mutations (graph/kv/indexing.go:409-480)
        rather than store rewrites; this is that discipline applied
        to the ANN sidecar index."""
        delta = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).withColumn("c", _nearest(F.col("v"), self.centroids))
        if path is not None:
            if self._has_unsaved:
                # the re-read below would replace the in-memory view
                # with the files, silently dropping every vector
                # added via add(path=None) since the last save()
                raise ValueError(
                    f"add(path={path!r}): this index holds in-memory "
                    f"vectors from earlier add(path=None) calls that "
                    f"the saved layout does not — call save() first "
                    f"or they would be silently dropped"
                )
            # a crash between a prior save/compact's renames leaves
            # buckets only in buckets.old — restore it BEFORE the
            # append, or mode('append') would recreate buckets/ with
            # only the delta (the centroid guard below cannot catch
            # this: the centroids sidecar is never swapped) and the
            # next swap's entry guard would delete buckets.old, the
            # only full copy
            _recover_swap(self.spark, path, "buckets")
            # guard: the path must hold THIS index's saved layout —
            # appending to an unrelated/empty dir and then re-reading
            # it would silently replace the in-memory view with only
            # the delta, dropping every unsaved base vector
            try:
                crow = self.spark.read.parquet(
                    os.path.join(path, "centroids")
                ).head()
            except Exception as e:
                raise ValueError(
                    f"add(path={path!r}): no saved index at path "
                    f"(call save() first) — appending there would "
                    f"orphan the in-memory base vectors"
                ) from e
            if [list(c) for c in crow["centroids"]] != [
                list(c) for c in self.centroids
            ]:
                raise ValueError(
                    f"add(path={path!r}): saved centroids differ from "
                    f"this index's — wrong path or stale index object"
                )
            delta.write.mode("append").partitionBy("c").parquet(
                os.path.join(path, "buckets")
            )
            # re-read so the in-memory view shares lineage with the
            # files (and stays partition-prunable on c)
            self.bucketed = self.spark.read.parquet(
                os.path.join(path, "buckets")
            )
        else:
            self.bucketed = self.bucketed.unionByName(delta)
            self._has_unsaved = True
        return self

    def bucket_counts(self) -> DataFrame:
        """(c, n) inverted-list sizes — the rebuild trigger metric."""
        return self.bucketed.groupBy("c").agg(F.count(F.lit(1)).alias("n"))

    def save(self, path: str) -> "IVFIndex":
        # Staged write + rename swap (same discipline as
        # GraphStore.save): self.bucketed may be LAZY over the very
        # files being replaced (a loaded index, or one that took
        # in-memory adds on top of a load) — a direct overwrite would
        # read files mid-delete. The tmp indirection also closes the
        # half-written-on-crash window.
        self.bucketed.write.mode("overwrite").partitionBy("c").parquet(
            os.path.join(path, "buckets.save.tmp")
        )
        # token stamped in the tmp (rides the swap atomically) and
        # echoed in the sidecar written after: a crash between the
        # two leaves new buckets paired with STALE centroids — loads
        # would silently probe the wrong inverted lists; the token
        # check turns that into a loud error
        import uuid

        token = uuid.uuid4().hex
        _stamp_token(
            self.spark, os.path.join(path, "buckets.save.tmp"), token
        )
        _swap_dir(self.spark, path, "buckets")
        # The centroid matrix rides along as a 1-row Parquet table,
        # written through Spark's writer so save/load work on ANY
        # Hadoop filesystem (s3://, hdfs://, file://) — a builtin
        # open() sidecar would half-succeed on remote paths (buckets
        # land on S3, sidecar lands on the driver's local disk).
        self.spark.createDataFrame(
            [(self.centroids, token)],
            "centroids array<array<double>>, token string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        )
        # reads go through the swapped files from here on
        self.bucketed = self.spark.read.parquet(
            os.path.join(path, "buckets")
        )
        self._has_unsaved = False
        return self

    def compact(self, path: str) -> "IVFIndex":
        """Rewrite the bucket layout target-sized. Every ``add(path)``
        appends one new file set into the touched bucket directories —
        after a year of daily deltas an inverted list is thousands of
        tiny files, the classic read-amplification trap (every probe
        pays per-file open/footer cost). Compaction reads the current
        layout, rewrites each bucket as one file run, and swaps via
        rename — reads before and after return identical rows, only
        the file count drops. Same staged-swap discipline as
        GraphStore.compact (crash before the rename leaves the old
        layout intact; retry heals)."""
        if self._has_unsaved:
            raise ValueError(
                "compact: index holds unsaved in-memory vectors — "
                "call save() first"
            )
        # same crash-window restore as every sibling maintenance
        # entry point (LSHDedupIndex.compact / SubstrDedupIndex.
        # compact): buckets may live only in buckets.old after an
        # interrupted swap — recover instead of failing path-not-found
        _recover_swap(self.spark, path, "buckets")
        cur = self.spark.read.parquet(os.path.join(path, "buckets"))
        # one file run per bucket: repartition on the partition column
        # so each directory's rows land in a single task's writer
        cur.repartition("c").write.mode("overwrite").partitionBy(
            "c"
        ).parquet(os.path.join(path, "buckets.save.tmp"))
        # compaction preserves semantics, so it must preserve the
        # save-consistency token: the centroids sidecar is untouched
        # and still echoes it
        tok = _read_token(self.spark, os.path.join(path, "buckets"))
        if tok is not None:
            _stamp_token(
                self.spark, os.path.join(path, "buckets.save.tmp"), tok
            )
        _swap_dir(self.spark, path, "buckets")
        self.bucketed = self.spark.read.parquet(
            os.path.join(path, "buckets")
        )
        return self

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFIndex":
        # a crash between a prior save/compact's two renames leaves
        # the bucket layout only in buckets.old — restore before read
        _recover_swap(spark, path, "buckets")
        crow = spark.read.parquet(os.path.join(path, "centroids")).head()
        _check_token(
            spark,
            os.path.join(path, "buckets"),
            crow["token"] if "token" in crow.__fields__ else None,
        )
        cents = [list(c) for c in crow["centroids"]]
        bucketed = spark.read.parquet(os.path.join(path, "buckets"))
        return cls(spark, cents, bucketed)

    def _probes(self, qv: list[float], nprobe: int) -> list[int]:
        dim = len(self.centroids[0]) if self.centroids else 0
        if len(qv) != dim:
            # zip() would silently truncate and probe the wrong
            # buckets — fail loudly instead
            raise ValueError(
                f"query vector has dim {len(qv)}, index has dim {dim}"
            )
        ds = [
            (sum((a - b) * (a - b) for a, b in zip(qv, c)), i)
            for i, c in enumerate(self.centroids)
        ]
        return [i for _, i in sorted(ds)[:nprobe]]

    def query(
        self,
        queries: dict[int, list[float]],
        k: int = 5,
        nprobe: int = 4,
        exclude_self: bool = True,
    ) -> DataFrame:
        """queries: {query_id: vector}. Returns
        (query_id, neighbor_id, score) — cosine top-k per query over
        the probed buckets only. ``exclude_self=True`` (the corpus
        self-query convention, matching ``ivf_topk``) drops the
        neighbor whose id EQUALS the query id — correct when query
        ids are vector ids, as in dedup/self-join use. Pass
        ``exclude_self=False`` when query ids are an unrelated
        namespace: there the id match is coincidental and the filter
        would silently drop one legitimate neighbor per collision."""
        from pyspark.sql.window import Window

        probe_rows = [
            (int(qid), c, list(map(float, qv)))
            for qid, qv in queries.items()
            for c in self._probes(qv, nprobe)
        ]
        probe_df = self.spark.createDataFrame(
            probe_rows, "query_id long, c int, q array<double>"
        )
        # the c-filter arrives via the join keys on a c-partitioned
        # read: AQE's runtime filter / the literal isin below prunes
        # whole bucket directories before any row is read
        cs = sorted({c for _, c, _ in probe_rows})
        pruned = self.bucketed.where(F.col("c").isin(cs))
        scored = pruned.join(F.broadcast(probe_df), "c")
        if exclude_self:
            scored = scored.where(F.col("id") != F.col("query_id"))
        scored = (
            scored
            .select(
                "query_id",
                F.col("id").alias("neighbor_id"),
                cosine(F.col("q"), F.col("v")).alias("score"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "score")
        )

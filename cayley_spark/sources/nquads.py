"""N-Quads source/sink (reference format: quad/nquads; used by the
reference's load/dump CLI, /root/reference/cmd/cayley/command/database.go:88-168).

Reader: ``spark.read.text`` + one Java-regex tokenization per line —
fully distributed, no Python in the row path. Writer: a single
``select(concat_ws(...))`` over resolved terms.

Note: for large ingests, persist the store (``store.save(path)`` →
``GraphStore.load``) before querying. Querying straight off the text
lineage is correct but can push the fused parse+query stage past
janino's 64 KB method limit, dropping that stage to interpreted mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..store import GraphStore

_TERM = r'<[^>]*>|_:[^\s]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)?'


def read_nquads(spark: SparkSession, path: str) -> GraphStore:
    # ONE regex evaluation per line (regexp_extract_all over the term
    # alternation), then cheap array indexing — keeps the fused ingest
    # pipeline inside whole-stage codegen (a per-column line-regex
    # blew janino's 64 KB method limit).
    lines = spark.read.text(path)
    toks = lines.where(
        ~F.col("value").rlike(r"^\s*(#.*)?$")
    ).select(
        F.regexp_extract_all("value", F.lit(f"({_TERM})"), 1).alias("ts")
    )
    n = F.size("ts")
    # F.get (not []) — null-safe: filter/project order isn't guaranteed
    # once Catalyst pushes predicates around
    parsed = toks.where((n == 3) | (n == 4)).select(
        F.get("ts", 0).alias("st"),
        F.get("ts", 1).alias("pt"),
        F.get("ts", 2).alias("ot"),
        F.when(n == 4, F.get("ts", 3)).alias("lt"),
    )
    return GraphStore.from_term_quads(parsed)


def write_nquads(store: GraphStore, df: DataFrame | None = None) -> DataFrame:
    """Render the store's quads (or a subset DF[s,p,o,l]) as N-Quads
    lines: DataFrame[value: string], ready for ``.write.text``."""
    quads = df if df is not None else store.quads
    rendered = store.resolve(quads, cols=["s", "p", "o", "l"])
    return rendered.select(
        F.concat_ws(
            " ",
            F.col("s"),
            F.col("p"),
            F.col("o"),
            *([F.col("l")] if "l" in rendered.columns else []),
            F.lit("."),
        ).alias("value")
    )

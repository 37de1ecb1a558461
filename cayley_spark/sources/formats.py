"""Graph file formats beyond N-Quads: JSON-LD (read/write), GraphML,
GML, DOT (write) — the reference's format registry surface
(/root/reference/cmd/cayley/command/convert.go:75-77 `load/dump/
convert` CLI; format list served by /api/v2/formats,
/root/reference/server/http/api_v2.go:125-139).

Writers are DataFrame programs producing DataFrame[value: string]
lines (compose with ``df.write.text``): body lines render distributed
via format_string over resolved terms; constant header/footer lines
are unioned in as literal rows, ordered by an explicit section column
so the text sink can write header-body-footer with a single
``orderBy`` — no driver-side string assembly.

JSON-LD: a pragmatic subset — the compacted node-object form the
reference ships as a fixture (data/people.jsonld: @context with
prefix + @vocab, @graph of node objects, @id/@type keys, nested
{"@id": ...} references). Full expansion/framing of arbitrary
JSON-LD is out of scope."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..store import GraphStore
from ..values import IRI, String, coerce

RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


# ---------------------------------------------------------------
# JSON-LD
# ---------------------------------------------------------------


def _expand(ctx: dict, key: str) -> str:
    if key.startswith("@"):
        return key
    if ":" in key:
        pref, _, rest = key.partition(":")
        if pref in ctx and isinstance(ctx[pref], str):
            return ctx[pref] + rest
    if "@vocab" in ctx:
        return ctx["@vocab"] + key
    return key


def read_jsonld(spark: SparkSession, path: str) -> GraphStore:
    """Compacted JSON-LD document → GraphStore. The document is
    driver-parsed (JSON-LD files are configuration-sized; bulk data
    belongs in n-quads/parquet), the store build is distributed."""
    with open(path) as f:
        doc = json.load(f)
    ctx = doc.get("@context", {})
    nodes = doc.get("@graph", doc if isinstance(doc, list) else [doc])
    quads: list[tuple] = []

    def node_value(v):
        if isinstance(v, dict) and "@id" in v:
            return IRI(_expand(ctx, v["@id"]))
        return coerce(v)

    def walk(obj: dict):
        sid = IRI(_expand(ctx, obj["@id"])) if "@id" in obj else None
        if sid is None:
            return None
        for k, v in obj.items():
            if k == "@id":
                continue
            if k == "@type":
                for t in v if isinstance(v, list) else [v]:
                    quads.append(
                        (sid, IRI(RDF_TYPE_IRI), IRI(_expand(ctx, t)))
                    )
                continue
            pred = IRI(_expand(ctx, k))
            for x in v if isinstance(v, list) else [v]:
                if isinstance(x, dict) and "@id" not in x:
                    continue  # blank nested nodes unsupported in subset
                quads.append((sid, pred, node_value(x)))
                if isinstance(x, dict):
                    walk(x)
        return sid

    for obj in nodes:
        walk(obj)
    return GraphStore.from_quad_values(spark, quads)


def write_jsonld(store: GraphStore) -> str:
    """GraphStore → compacted JSON-LD string (driver-side assembly of
    a result-sized document; the per-subject grouping is one shuffle)."""
    terms = store.nodes.select("id", "term", "kind", "str")
    q = (
        store.quads.join(
            terms.select(
                F.col("id").alias("s"), F.col("term").alias("sterm")
            ),
            "s",
        )
        .join(
            terms.select(F.col("id").alias("p"), F.col("str").alias("pstr")),
            "p",
        )
        .join(
            terms.select(
                F.col("id").alias("o"),
                F.col("term").alias("oterm"),
                F.col("kind").alias("okind"),
                F.col("str").alias("ostr"),
            ),
            "o",
        )
        .groupBy("sterm")
        .agg(F.collect_list(F.struct("pstr", "oterm", "okind", "ostr")).alias("po"))
        .orderBy("sterm")
        .collect()
    )
    graph = []
    for row in q:
        obj: dict = {"@id": row["sterm"].strip("<>")}
        for e in row["po"]:
            if e["pstr"] == RDF_TYPE_IRI:
                key, val = "@type", e["ostr"]
            else:
                key = e["pstr"]
                if e["okind"] == "iri":
                    val = {"@id": e["ostr"]}
                else:
                    from ..values import parse_term

                    val = parse_term(e["oterm"]).native()
            if key in obj:
                prev = obj[key]
                obj[key] = (prev if isinstance(prev, list) else [prev]) + [val]
            else:
                obj[key] = val
        graph.append(obj)
    return json.dumps({"@graph": graph}, indent=2, sort_keys=True)


# ---------------------------------------------------------------
# GraphML / GML / DOT writers
# ---------------------------------------------------------------


def _sections(
    store: GraphStore, header: list[str], node_fmt, edge_fmt, footer: list[str]
) -> DataFrame:
    """header lines + per-node lines + per-edge lines + footer lines,
    ordered by section then content (deterministic output)."""
    spark = store.spark
    terms = store.nodes.select("id", "term")

    def lit_rows(sec: int, lines: list[str]) -> DataFrame:
        return spark.createDataFrame(
            [(sec, i, s) for i, s in enumerate(lines)], "sec int, ord long, value string"
        )

    rq = store.resolve(store.quads, ["s", "p", "o"])
    used = (
        store.quads.select(F.col("s").alias("id"))
        .unionAll(store.quads.select(F.col("o").alias("id")))
        .distinct()
        .join(terms, "id")
        .select("term")
    )
    nodes_df = used.select(
        F.lit(1).alias("sec"),
        F.monotonically_increasing_id().alias("ord"),
        node_fmt(F.col("term")).alias("value"),
    )
    edges_df = rq.select(
        F.lit(2).alias("sec"),
        F.monotonically_increasing_id().alias("ord"),
        edge_fmt(F.col("s"), F.col("p"), F.col("o")).alias("value"),
    )
    out = (
        lit_rows(0, header)
        .unionAll(nodes_df)
        .unionAll(edges_df)
        .unionAll(lit_rows(3, footer))
    )
    return out.orderBy("sec", "ord").select("value")


def _xml_esc(c):
    out = c
    for a, b in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]:
        out = F.replace(out, F.lit(a), F.lit(b))
    return out


def write_graphml(store: GraphStore) -> DataFrame:
    hdr = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '<graph id="G" edgedefault="directed">',
    ]
    node = lambda t: F.format_string('<node id="%s"/>', _xml_esc(t))
    edge = lambda s, p, o: F.format_string(
        '<edge source="%s" target="%s"><data key="predicate">%s</data></edge>',
        _xml_esc(s), _xml_esc(o), _xml_esc(p),
    )
    return _sections(store, hdr, node, edge, ["</graph>", "</graphml>"])


def write_gml(store: GraphStore) -> DataFrame:
    esc = lambda c: F.replace(c, F.lit('"'), F.lit("'"))
    node = lambda t: F.format_string('  node [ id "%s" ]', esc(t))
    edge = lambda s, p, o: F.format_string(
        '  edge [ source "%s" target "%s" label "%s" ]', esc(s), esc(o), esc(p)
    )
    return _sections(store, ["graph ["], node, edge, ["]"])


def write_dot(store: GraphStore) -> DataFrame:
    esc = lambda c: F.replace(c, F.lit('"'), F.lit('\\"'))
    node = lambda t: F.format_string('  "%s";', esc(t))
    edge = lambda s, p, o: F.format_string(
        '  "%s" -> "%s" [label="%s"];', esc(s), esc(o), esc(p)
    )
    return _sections(store, ["digraph cayley_graph {"], node, edge, ["}"])

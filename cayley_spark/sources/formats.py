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
        return key  # absolute IRI or unknown-prefix compact IRI
    if "@vocab" in ctx:
        return ctx["@vocab"] + key
    return key


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def read_jsonld(spark: SparkSession, path: str) -> GraphStore:
    """Compacted JSON-LD document → GraphStore. Supports @context
    (prefix terms, @vocab, @base), @graph, @id/@type, nested node
    objects including blank nodes, ``{"@value": ..}`` literals with
    @type/@language, and ``{"@list": [..]}`` collections expanded to
    rdf:first/rest chains. The document is driver-parsed (JSON-LD
    files are configuration-sized; bulk data belongs in
    n-quads/parquet), the store build is distributed."""
    from ..values import BNode, LangString, TypedString

    with open(path) as f:
        doc = json.load(f)
    ctx = doc.get("@context", {})
    base = ctx.get("@base", "")
    quads: list[tuple] = []
    n_bnodes = [0]

    def bnode() -> BNode:
        n_bnodes[0] += 1
        return BNode(f"b{n_bnodes[0]}")

    def iri(s: str):
        if s.startswith("_:"):
            return BNode(s[2:])
        s = _expand(ctx, s)
        if ":" not in s and base:
            s = base + s
        return IRI(s)

    def value(v):
        if isinstance(v, dict):
            if "@list" in v:
                items = [value(x) for x in v["@list"]]
                if not items:
                    return IRI(RDF_NS + "nil")
                cells = [bnode() for _ in items]
                for i, (c, it) in enumerate(zip(cells, items)):
                    quads.append((c, IRI(RDF_NS + "first"), it))
                    nxt = (
                        cells[i + 1]
                        if i + 1 < len(cells)
                        else IRI(RDF_NS + "nil")
                    )
                    quads.append((c, IRI(RDF_NS + "rest"), nxt))
                return cells[0]
            if "@value" in v:
                body = v["@value"]
                if "@language" in v:
                    return LangString(str(body), v["@language"])
                if "@type" in v:
                    return TypedString(str(body), _expand(ctx, v["@type"]))
                return coerce(body)
            return walk(v)
        return coerce(v)

    def walk(obj: dict):
        sid = iri(obj["@id"]) if "@id" in obj else bnode()
        for k, v in obj.items():
            if k == "@id" or k == "@context":
                continue
            if k == "@type":
                for t in v if isinstance(v, list) else [v]:
                    quads.append((sid, IRI(RDF_TYPE_IRI), iri(t)))
                continue
            if k.startswith("@"):
                continue
            pred = IRI(_expand(ctx, k))
            for x in v if isinstance(v, list) else [v]:
                quads.append((sid, pred, value(x)))
        return sid

    nodes = doc.get("@graph", doc if isinstance(doc, list) else [doc])
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


# ---------------------------------------------------------------
# JSON quads (the reference's quad/json format: a JSON array of
# {"subject", "predicate", "object", "label"} objects; values use
# N-Quads term syntax, bare strings are treated as IRIs)
# ---------------------------------------------------------------

_JSON_DIRS = ("subject", "predicate", "object", "label")


def _json_term(s: str | None):
    from ..values import parse_term

    if s is None:
        return None
    if s.startswith(("<", "_:", '"')):
        return parse_term(s)
    return IRI(s)


def read_json_quads(spark: SparkSession, path: str) -> GraphStore:
    """JSON quad array → GraphStore. Accepts a JSON array document or
    newline-delimited JSON objects; term fields in N-Quads syntax,
    bare strings as IRIs (the common published form)."""
    with open(path) as f:
        txt = f.read().strip()
    docs = (
        json.loads(txt)
        if txt.startswith("[")
        else [json.loads(line) for line in txt.splitlines() if line.strip()]
    )
    quads = []
    for d in docs:
        quads.append(tuple(_json_term(d.get(k)) for k in _JSON_DIRS))
    return GraphStore.from_quad_values(spark, quads)


def write_json_quads(store: GraphStore) -> str:
    """GraphStore → JSON quad array string (terms in N-Quads syntax).
    Driver-side assembly of a result-sized document, like the other
    text writers."""
    rows = store.resolve(store.quads.select("s", "p", "o", "l")).collect()
    out = []
    for r in rows:
        d = {"subject": r["s"], "predicate": r["p"], "object": r["o"]}
        if r["l"] is not None:
            d["label"] = r["l"]
        out.append(d)
    return json.dumps(out, indent=1, sort_keys=True)

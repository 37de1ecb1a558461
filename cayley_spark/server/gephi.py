"""Gephi GraphStream endpoint — ``GET /gephi/gs``.

Re-expression of the reference's visualization streamer
(internal/gephi/stream.go; route internal/http/http.go:66-67). Wire
format is the Gephi graph-streaming protocol: one JSON event object
per line, ``\\r\\n`` line endings, ``an``/``cn``/``ae`` keys (add
node / change node / add edge), node ids as hex insertion counters,
edge ids ``q<hex>``.

Two modes, as in the reference (stream.go:352-383):

- ``raw`` (default): stream quads as edges, optionally filtered by
  ``sub``/``pred``/``obj``/``label`` (comma-separated term strings);
- ``nodes``: stream nodes with inline properties — predicates marked
  ``<pred> <gephi:inline> true`` plus the well-known defaults
  (gephi:x/y, rdf:type, rdfs:label, schema:name, schema:url) fold
  into node attributes; everything else becomes an edge.

The quad scan itself is a Spark plan (predicate pushdown applies);
the event assembly streams through ``toLocalIterator`` because this
endpoint is a driver-side HTTP feed in the reference too — it exists
to push a bounded sample (default limit 10000) into a Gephi UI, not
to move the graph.

Node x/y positions are hash-derived (deterministic) rather than the
reference's ``rand.Float64`` — positions are presentational, and
determinism keeps the endpoint testable.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

DEFAULT_LIMIT = 10000
DEFAULT_SIZE = 20
LIMIT_COORD = 500

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SCHEMA = "http://schema.org/"

IRI_INLINE = "gephi:inline"
IRI_X = "gephi:x"
IRI_Y = "gephi:y"

#: stream.go:39-46 defaultInline (short and expanded forms)
DEFAULT_INLINE_TERMS = (
    f"<{IRI_X}>",
    f"<{IRI_Y}>",
    "<rdf:type>",
    f"<{RDF}type>",
    "<rdfs:label>",
    f"<{RDFS}label>",
    "<schema:name>",
    f"<{SCHEMA}name>",
    "<schema:url>",
    f"<{SCHEMA}url>",
)


def _native(term: str):
    from ..values import parse_term

    if term is None:
        return None
    v = parse_term(term)
    return v.native()


def _label_str(term: str) -> str:
    n = _native(term)
    return "" if n is None else str(n)


def _coords(term: str) -> tuple[float, float]:
    """Deterministic position on the |r| <= LIMIT_COORD disc."""
    from ..hashing import hash_str

    h = hash_str("pos:" + term)
    x = ((h & 0xFFFFFFFF) / 0xFFFFFFFF - 0.5) * 2 * LIMIT_COORD
    y = (((h >> 32) & 0xFFFFFFFF) / 0xFFFFFFFF - 0.5) * 2 * LIMIT_COORD
    # fold into the disc rather than rejection-sample (deterministic)
    while x * x + y * y > LIMIT_COORD * LIMIT_COORD:
        x, y = x / 2, y / 2
    return x, y


class GraphStream:
    """Event assembler (stream.go:54-216): tracks seen nodes, emits
    an/cn/ae event lines."""

    def __init__(self):
        self.seen: dict[str, int] = {}
        self.lines: list[str] = []

    def _emit(self, obj) -> None:
        self.lines.append(json.dumps(obj, ensure_ascii=False) + "\r\n")

    def _make_node(self, term: str, props: dict[str, str] | None) -> dict:
        props = props or {}
        x, y = _coords(term)
        xok = yok = False
        for key, setter in ((f"<{IRI_X}>", "x"), (f"<{IRI_Y}>", "y")):
            if key in props:
                n = _native(props[key])
                if isinstance(n, (int, float)) and not isinstance(n, bool):
                    if setter == "x":
                        x, xok = float(n), True
                    else:
                        y, yok = float(n), True
        label = ""
        for key in (f"<{RDFS}label>", "<rdfs:label>", f"<{SCHEMA}name>", "<schema:name>"):
            if key in props and not label:
                label = _label_str(props[key])
        node = {
            "label": label or _native(term),
            "size": DEFAULT_SIZE,
            "x": x,
            "y": y,
        }
        for k, v in props.items():
            if (k == f"<{IRI_X}>" and xok) or (k == f"<{IRI_Y}>" and yok):
                continue
            node[_label_str(k)] = _label_str(v)
        return node

    def add_node(self, term: str, props: dict | None = None) -> str:
        if term in self.seen:
            return format(self.seen[term], "x")
        if term is None:
            return ""
        sid = format(len(self.seen), "x")
        self.seen[term] = len(self.seen)
        self._emit({"an": {sid: self._make_node(term, props)}})
        return sid

    def change_node(self, term: str, sid: str, props: dict) -> None:
        self._emit({"cn": {sid: self._make_node(term, props)}})

    def add_edge(self, i: int, s: str, o: str, p_term: str) -> None:
        ps = _label_str(p_term)
        self._emit({
            "ae": {
                "q" + format(i, "x"): {
                    "source": s,
                    "label": ps,
                    "pred": ps,
                    "target": o,
                }
            }
        })


def _resolved_quads(store):
    """quads with s/p/o term strings (label term optional)."""
    terms = store.nodes.select("id", "term")
    q = store.quads
    for d in ("s", "p", "o"):
        t = terms.select(
            F.col("id").alias(f"__{d}"), F.col("term").alias(f"{d}_term")
        )
        q = q.join(t, F.col(d) == F.col(f"__{d}")).drop(f"__{d}")
    return q


def stream_raw(store, limit: int = DEFAULT_LIMIT,
               sub=None, pred=None, obj=None, label=None) -> str:
    """raw mode (stream.go:216-246): every quad is an edge."""
    from ..values import coerce

    gs = GraphStream()
    q = _resolved_quads(store)
    for d, vals in (("s", sub), ("p", pred), ("o", obj), ("l", label)):
        if vals:
            ids = [coerce(v).id for v in vals]
            q = q.where(F.col(d).isin(ids))
    i = 0
    for row in q.limit(limit if limit > 0 else DEFAULT_LIMIT).toLocalIterator():
        s = gs.add_node(row["s_term"])
        o = gs.add_node(row["o_term"])
        if s == "" or o == "":
            continue
        gs.add_edge(i, s, o, row["p_term"])
        i += 1
    return "".join(gs.lines)


def stream_nodes(store, limit: int = DEFAULT_LIMIT) -> str:
    """nodes mode (stream.go:247-340): subjects stream with inline
    properties folded into node attributes; other links become
    edges; nodes with no outgoing links are skipped."""
    from ..values import parse_term

    gs = GraphStream()
    # predicates marked inline: ?p <gephi:inline> true
    inline_pred = parse_term(f"<{IRI_INLINE}>")
    marked = (
        store.quads.where(F.col("p") == F.lit(inline_pred.id))
        .join(
            store.nodes.select(F.col("id").alias("s"), F.col("term").alias("t")),
            "s",
        )
        .select("t")
        .collect()
    )
    inline_terms = set(DEFAULT_INLINE_TERMS) | {r["t"] for r in marked}

    q = _resolved_quads(store).withColumn(
        "__okind",
        F.lit(None).cast("string"),
    )
    kinds = store.nodes.select(F.col("id").alias("__oid"), F.col("kind").alias("okind"))
    q = (
        q.drop("__okind")
        .join(kinds, F.col("o") == F.col("__oid"))
        .drop("__oid")
        .where(~F.col("s_term").isin(list(inline_terms)))
        .orderBy("s", "p", "o")
    )
    ignore: set[str] = set()
    qi = 0
    n_subjects = 0
    cur = None
    cur_sid = ""
    cur_props: dict[str, str] = {}
    limit = limit if limit > 0 else DEFAULT_LIMIT

    def finish_subject():
        nonlocal cur, cur_sid, cur_props
        if cur is not None and cur_sid and cur_props:
            gs.change_node(cur, cur_sid, cur_props)
        cur, cur_sid, cur_props = None, "", {}

    for row in q.toLocalIterator():
        s_term = row["s_term"]
        if s_term in ignore:
            continue
        if s_term != cur:
            finish_subject()
            n_subjects += 1
            if n_subjects > limit:
                break
            cur = s_term
            cur_sid = gs.add_node(s_term)
        p_term, o_term, okind = row["p_term"], row["o_term"], row["okind"]
        if p_term in inline_terms:
            cur_props[p_term] = o_term
            ignore.add(o_term)
        elif okind in ("bool", "int", "float"):
            cur_props[p_term] = o_term
        else:
            o = gs.add_node(o_term)
            if o == "":
                continue
            gs.add_edge(qi, cur_sid, o, p_term)
            qi += 1
    finish_subject()
    return "".join(gs.lines)

"""LinkedQL — JSON-LD step-object query language.

Re-expression of /root/reference/query/linkedql/ (registry-driven: one
step type per file under query/linkedql/steps/, JSON test cases in
steps/test-cases/). A query is a JSON-LD object whose ``@type`` names
a step and whose ``from`` chains the previous step; the registry maps
each step onto the Path API.

Covered steps (the full registry): Vertex, Match, Visit, VisitReverse,
Out, In, Both, Has, HasReverse, Intersect, Union, Difference, Back,
As, Select, Documents, Count, Limit, Skip, Order, Unique, Like,
RegExp, LessThan, LessThanEquals, GreaterThan, GreaterThanEquals,
Labels, PropertyNames, ReversePropertyNames, Properties,
ReverseProperties, PropertyNamesAs, ReversePropertyNamesAs, Where,
Placeholder, Optional, Collect.

Results use JSON-LD value encoding: IRIs as {"@id": iri}, literals
native, Count as a bare number list, Documents as one {"@graph": [...]}
of per-entity objects with array-valued properties."""

from __future__ import annotations

import json
from typing import Any

from .. import shapes as S
from .path import Path
from ..store import GraphStore
from ..values import BNode, IRI, Value, coerce, parse_term

VOCAB = "http://cayley.io/linkedql#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _to_value(v) -> Value:
    if isinstance(v, dict):
        if "@id" in v:
            return IRI(v["@id"])
        if "@value" in v:
            return coerce(v["@value"])
    return coerce(v)


def _pred_values(v) -> list[Value]:
    """Property references: bare strings are IRIs in LinkedQL."""
    vs = v if isinstance(v, list) else [v]
    return [IRI(x) if isinstance(x, str) else _to_value(x) for x in vs]


def _from_json(term: str):
    """N-Quads term → JSON-LD value."""
    v = parse_term(term)
    if isinstance(v, IRI):
        return {"@id": v.s}
    if isinstance(v, BNode):
        return {"@id": "_:" + v.s}
    return v.native()


def _compact_documents(docs: dict[str, dict]):
    """JSON-LD compaction of the per-entity property map, matching
    what the reference gets from json-gold's datasetToCompact
    (jsonld_util.go:9-17) on this corpus:

    - blank nodes holding exactly one rdf:first and one rdf:rest are
      list cells; chains ending in rdf:nil fold into an ``@list``
      value at their reference site, and consumed cells disappear;
    - a blank root that nothing references loses its ``@id``;
    - a single remaining document is returned bare in a one-element
      list (the reference's iterator emits one compacted result);
      multiple documents nest under ``@graph``.
    """
    first, rest, nil = RDF + "first", RDF + "rest", RDF + "nil"

    def bnode_key(v) -> str | None:
        if isinstance(v, dict) and v.get("@id", "").startswith("_:"):
            return v["@id"]
        return None

    cells: dict[str, tuple] = {}
    for key, props in docs.items():
        if (
            key.startswith("_:")
            and set(props) == {first, rest}
            and len(props[first]) == 1
            and len(props[rest]) == 1
        ):
            cells[key] = (props[first][0], props[rest][0])

    def fold(head: str):
        """Walk a cell chain to rdf:nil; None if broken/cyclic."""
        items, k, steps = [], head, 0
        while steps <= len(cells):
            if k not in cells:
                return None
            v, nxt = cells[k]
            items.append(v)
            if isinstance(nxt, dict) and nxt.get("@id") == nil:
                return items
            k = bnode_key(nxt)
            if k is None:
                return None
            steps += 1
        return None

    consumed: set[str] = set()
    for key, props in docs.items():
        if key in cells:
            continue
        for pred, vals in props.items():
            for i, v in enumerate(vals):
                head = bnode_key(v)
                if head is None or head not in cells:
                    continue
                folded = fold(head)
                if folded is None:
                    continue
                vals[i] = {"@list": folded}
                while head in cells:
                    consumed.add(head)
                    head = bnode_key(cells[head][1])
    for k in consumed:
        docs.pop(k, None)

    referenced = {
        v["@id"]
        for props in docs.values()
        for vals in props.values()
        for v in vals
        if isinstance(v, dict) and "@id" in v
    }
    out = []
    for key in sorted(docs):
        node: dict = {}
        if not (key.startswith("_:") and key not in referenced):
            node["@id"] = key
        for pred, vals in docs[key].items():
            if len(vals) == 1 and isinstance(vals[0], dict) and "@list" in vals[0]:
                node[pred] = vals[0]
            else:
                node[pred] = vals
        out.append(node)
    if len(out) == 1:
        return out
    return {"@graph": out}


class LinkedQLSession:
    def __init__(self, store: GraphStore):
        self.store = store

    def execute(self, query: str | dict) -> list:
        q = json.loads(query) if isinstance(query, str) else query
        step_type = q.get("@type", "")
        path = self._build(q)
        if step_type == "Count":
            return [path.count()]
        if step_type == "Documents":
            # reference iter_docs.go: tag names are predicate IRIs; each
            # result row contributes (entity, tag, value) triples. The
            # reference compacts the resulting dataset with json-gold;
            # _compact_documents applies the same algorithm's effects
            # for this corpus: rdf:first/rest chains fold to @list,
            # unreferenced blank roots drop @id, a single root document
            # is returned bare (in a one-element list, matching the
            # reference iterator protocol).
            docs: dict[str, dict] = {}
            for r in path.all():
                rid = r.get("id")
                if rid is None:
                    continue
                ent = _from_json(rid)
                key = ent["@id"] if isinstance(ent, dict) else str(ent)
                d = docs.setdefault(key, {})
                for k, v in r.items():
                    if k == "id" or v is None:
                        continue
                    jv = _from_json(v)
                    vals = d.setdefault(k, [])
                    if jv not in vals:
                        vals.append(jv)
            return _compact_documents(docs)
        if step_type == "Select":
            tags = q.get("tags") or None
            rows = path.all()
            out = []
            for r in rows:
                sel = {
                    k: _from_json(v)
                    for k, v in r.items()
                    if k != "id" and v is not None and (not tags or k in tags)
                }
                out.append(sel)
            return out
        return [
            _from_json(r["id"]) for r in path.all() if r["id"] is not None
        ]

    # ---------------- step registry ----------------

    def _build(self, q: dict) -> Path:
        t = q.get("@type", "").removeprefix(VOCAB)
        if t == "Placeholder":
            # reference steps/placeholder.go: StartMorphism — resolves
            # to the values of the context it is placed in
            return Path.morphism()
        if t == "Vertex":
            vals = [_to_value(v) for v in q.get("values", [])]
            return Path.start(self.store, *vals)
        if t == "Match":
            pat = q.get("pattern", {})
            p = Path.start(self.store)
            if "@id" in pat:
                p = p.is_(IRI(pat["@id"]))
            for k, v in pat.items():
                if k.startswith("@"):
                    continue
                p = p.has(IRI(k), *_pred_values(v))
            return p
        if t == "Back" and not q.get("name"):
            # anonymous Back: reposition at the previous step's input
            # (reference steps/back.go with name "") — tag the inner
            # step's source invisibly, apply the step, jump back
            inner = q["from"]
            if "from" not in inner:
                return self._build(inner)
            base = self._build(inner["from"]).tag("back_anon_")
            return self._apply(inner, base).back("back_anon_")
        p = self._build(q["from"]) if "from" in q else Path.start(self.store)
        return self._apply(q, p)

    def _apply(self, q: dict, p: Path) -> Path:
        t = q.get("@type", "").removeprefix(VOCAB)
        if t in ("Visit", "Out", "View"):
            return p.out(*_pred_values(q.get("properties", [])))
        if t in ("VisitReverse", "In", "ViewReverse"):
            return p.in_(*_pred_values(q.get("properties", [])))
        if t == "Both":
            return p.both(*_pred_values(q.get("properties", [])))
        if t == "Has":
            return p.has(
                _pred_values(q["property"])[0],
                *[_to_value(v) for v in q.get("values", [])],
            )
        if t == "HasReverse":
            return p.has_r(
                _pred_values(q["property"])[0],
                *[_to_value(v) for v in q.get("values", [])],
            )
        if t == "Intersect":
            return p.and_(self._build(q["steps"][0] if "steps" in q else q["intersectee"]))
        if t == "Union":
            return p.or_(self._build(q["steps"][0] if "steps" in q else q["unionized"]))
        if t == "Difference":
            return p.except_(self._build(q["steps"][0] if "steps" in q else q["step"]))
        if t == "Back":
            return p.back(q["name"])
        if t == "As":
            return p.tag(q["name"])
        if t in ("Select", "Documents"):
            return p
        if t == "Count":
            return p
        if t == "Limit":
            return p.limit(int(q["limit"]))
        if t == "Skip":
            return p.skip(int(q["offset"] if "offset" in q else q["skip"]))
        if t == "Order":
            return p.order()
        if t == "Unique":
            return p.unique()
        if t == "Like":
            return p.like(q["likePattern"])
        if t == "RegExp":
            # reference steps/regexp.go field is `expression`
            pat = q["expression"] if "expression" in q else q["pattern"]
            return p.regex(pat, refs=bool(q.get("includeIRIs")))
        for op, name in [
            ("lt", "LessThan"),
            ("lte", "LessThanEquals"),
            ("gt", "GreaterThan"),
            ("gte", "GreaterThanEquals"),
        ]:
            if t == name:
                return p.filter(S.Comparison(op, _to_value(q["value"])))
        if t == "Labels":
            return p.labels()
        if t == "PropertyNames":
            return p.out_predicates()
        if t == "ReversePropertyNames":
            return p.in_predicates()
        if t == "PropertyNamesAs":
            # reference steps/property_names_as.go: SavePredicates(false)
            return p.save_out_predicates(q["tag"])
        if t == "ReversePropertyNamesAs":
            # reference steps/reverse_property_names_as.go
            return p.save_in_predicates(q["tag"])
        if t in ("Properties", "ReverseProperties"):
            # reference steps/properties.go: one Save per name, tag =
            # the full property IRI (names are required — the reference
            # errors on nil names too)
            names = q.get("names")
            if names is None:
                raise ValueError("linkedql: Properties requires names")
            rev = t == "ReverseProperties"
            for n in names if isinstance(names, list) else [names]:
                iri = _pred_values(n)[0]
                p = p.save_r(iri, iri.s) if rev else p.save(iri, iri.s)
            return p
        if t == "Where":
            # reference steps/where.go: fromPath.And(condition.Reverse())
            # — the condition chain is rooted at a Placeholder morphism;
            # reversing it repositions its result at the placeholder
            cond = self._build(q["condition"])
            return p.and_(cond.reverse())
        if t == "Optional":
            return p.optional(self._build(q["step"]))
        if t == "Collect":
            # reference steps/collect.go: resolve RDF collections —
            # list cells via name / recursive rest, plus the scalar
            # fallback binding (max_depth caps the reference's
            # unlimited -1)
            name = _pred_values(q["name"])[0]
            first, rest = IRI(RDF + "first"), IRI(RDF + "rest")
            p1 = p.out(name).save(first, first.s).save(rest, rest.s)
            p2 = (
                p.out(name)
                .follow_recursive(rest)
                .save(first, first.s)
                .save(rest, rest.s)
            )
            p3 = p.save(name, name.s)
            return p1.or_(p2).or_(p3)
        raise ValueError(f"linkedql: unsupported step @type {t!r}")

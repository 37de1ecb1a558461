"""Schema ORM — dataclass ↔ quads codec.

Re-expression of the reference's reflection-based struct mapper
(/root/reference/schema/loader.go:92-147 LoadTo/LoadPathTo,
/root/reference/schema/writer.go:17-121 WriteAsQuads, config
/root/reference/schema/schema.go:51-70): Go structs with ``quad:``
tags become Python dataclasses with predicate metadata.

    @dataclass
    class Person:
        id: IRI = field(default=None)                 # the node itself
        name: str = quad_field("<name>")
        follows: list = quad_field("<follows>", default_factory=list)

- ``write_as_quads(objs)`` → list of (s, p, o) value tuples, with
  ``rdf:type`` rows when a type IRI is registered (schema.go GenerateID
  path uses bnodes for objects without an id).
- ``load_to(store, cls, ids=None)`` → instances. Execution is one
  DataFrame program: filter quads to the class's predicate set, group
  by subject with ``map_from_entries(collect_list(...))`` — one
  shuffle regardless of how many fields the class has, then one
  collect (the result set is driver-bound by definition).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import functions as F

from .store import GraphStore
from .values import BNode, IRI, Value, coerce, parse_term

RDF_TYPE = IRI("rdf:type")


def quad_field(pred: str, default=None, default_factory=None, optional=False):
    """Declare a dataclass field mapped to predicate ``pred``
    (N-Quads term or bare IRI name)."""
    kw: dict = {"metadata": {"quad_pred": pred, "quad_opt": optional}}
    if default_factory is not None:
        kw["default_factory"] = default_factory
    else:
        kw["default"] = default
    return field(**kw)


def _pred_value(pred: str) -> Value:
    return parse_term(pred) if pred.startswith("<") else IRI(pred)


def _fields(cls) -> list[tuple[str, Value, bool, bool]]:
    """(attr, predicate value, is_list, optional) per mapped field."""
    out = []
    for f in dataclasses.fields(cls):
        meta = f.metadata or {}
        if "quad_pred" not in meta:
            continue
        is_list = f.default_factory is list  # type: ignore[misc]
        out.append(
            (f.name, _pred_value(meta["quad_pred"]), is_list, meta["quad_opt"])
        )
    return out


_TYPE_IRIS: dict[type, Value] = {}


def register_type(cls, type_iri: str) -> None:
    """Attach an rdf:type IRI to a class (schema.go:51-70 type rules)."""
    _TYPE_IRIS[cls] = _pred_value(type_iri)


def write_as_quads(objs: list, id_attr: str = "id") -> list[tuple]:
    """Objects → (s, p, o) Value tuples (reference WriteAsQuads).
    Objects without an id get a deterministic bnode from their index."""
    quads: list[tuple] = []
    for i, obj in enumerate(objs):
        cls = type(obj)
        sid = getattr(obj, id_attr, None)
        if sid is None:
            sid = BNode(f"{cls.__name__.lower()}_{i}")
        elif not isinstance(sid, Value):
            sid = coerce(sid)
        if cls in _TYPE_IRIS:
            quads.append((sid, RDF_TYPE, _TYPE_IRIS[cls]))
        for attr, pred, is_list, _ in _fields(cls):
            v = getattr(obj, attr)
            vals = v if is_list else ([] if v is None else [v])
            for x in vals:
                # mapped-object reference → its id (Values are also
                # dataclasses, so exclude them explicitly)
                if dataclasses.is_dataclass(x) and not isinstance(x, Value):
                    x = getattr(x, id_attr)
                quads.append((sid, pred, coerce(x)))
    return quads


def load_to(
    store: GraphStore, cls, ids: list | None = None, id_attr: str = "id"
) -> list:
    """Instantiate ``cls`` for every subject carrying the class's
    predicates (or the given ids). One aggregation over the quad
    table; native values come back through the node dictionary."""
    fields = _fields(cls)
    pred_ids = [p.id for _, p, _, _ in fields]
    by_pred_id = {p.id: (attr, is_list) for attr, p, is_list, _ in fields}

    q = store.quads.where(F.col("p").isin(pred_ids))
    if cls in _TYPE_IRIS:
        typed = store.quads.where(
            (F.col("p") == F.lit(RDF_TYPE.id))
            & (F.col("o") == F.lit(_TYPE_IRIS[cls].id))
        ).select("s")
        q = q.join(typed, "s", "left_semi")
    if ids is not None:
        sids = [coerce(x).id if not isinstance(x, Value) else x.id for x in ids]
        q = q.where(F.col("s").isin(sids))

    terms = store.nodes.select("id", "term")
    sterm = terms.withColumnRenamed("id", "s").withColumnRenamed("term", "sterm")
    oterm = terms.withColumnRenamed("id", "o").withColumnRenamed("term", "oterm")
    rows = (
        q.join(sterm, "s")
        .join(oterm, "o")
        .groupBy("s", "sterm")
        .agg(
            F.collect_list(F.struct(F.col("p"), F.col("oterm"))).alias("pv")
        )
        .collect()
    )

    # required-field check mirrors loader.go's "not enough fields" skip
    required = {
        attr for attr, _, is_list, opt in fields if not is_list and not opt
    }
    out = []
    for r in rows:
        kw: dict[str, Any] = {attr: [] if is_list else None
                              for attr, _, is_list, _ in fields}
        for pv in r["pv"]:
            attr, is_list = by_pred_id[pv["p"]]
            val = parse_term(pv["oterm"]).native()
            if is_list:
                kw[attr].append(val)
            else:
                kw[attr] = val
        if any(kw[a] is None for a in required):
            continue
        for attr, _, is_list, _ in fields:
            if is_list:
                kw[attr] = sorted(kw[attr], key=str)
        obj = cls(**{id_attr: parse_term(r["sterm"]), **kw})
        out.append(obj)
    out.sort(key=lambda o: str(getattr(o, id_attr)))
    return out

"""RDFS inference store.

Re-expression of the reference ``inference`` package
(/root/reference/inference/inference.go): an index of RDFS schema —
classes and properties with sub/super links, property domain/range,
and instance reference counts — supporting the implemented entailment
subset (rules 1, 2, 3, 5, 6, 8, 10, 11 of the RDF/RDFS table cited
there).

The schema index is driver-side by design: its size is bounded by the
ontology, not the data. What IS data-sized — instance refcounts and
property-usage counts — is aggregated distributively in
``Store.from_graph`` (one groupBy over the quads table), so building
the index over a 100 TB graph collects only (predicate, count) pairs
and the schema triples themselves.

For scale-out *use* of the schema (e.g. expanding rdf:type filters to
subclass closures inside a query), ``subclass_closure_df`` /
``subproperty_closure_df`` export the transitive closure as a small
DataFrame suitable for a broadcast join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .values import BNode, IRI, Value, coerce

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"

TYPE = IRI(RDF + "type")
PROPERTY = IRI(RDF + "Property")
CLASS = IRI(RDFS + "Class")
RESOURCE = IRI(RDFS + "Resource")
SUB_CLASS_OF = IRI(RDFS + "subClassOf")
SUB_PROPERTY_OF = IRI(RDFS + "subPropertyOf")
DOMAIN = IRI(RDFS + "domain")
RANGE = IRI(RDFS + "range")


@dataclass(eq=False)
class Class:
    """An RDFS class and its links (inference.go:38-102)."""

    store: "Store"
    name: Value
    explicit: bool = False
    references: int = 0
    super: set = field(default_factory=set)
    sub: set = field(default_factory=set)
    own_prop: set = field(default_factory=set)
    in_prop: set = field(default_factory=set)

    def is_sub_class_of(self, super_class: "Class") -> bool:
        """Recursive subclass check; every class is a subclass of
        itself (rule 10) and of rdfs:Resource (rule 8)."""
        if self is super_class:
            return True
        if super_class is not None and super_class.name == RESOURCE:
            return True
        if super_class in self.super:
            return True
        return any(s.is_sub_class_of(super_class) for s in self.super)

    def _is_referenced(self) -> bool:
        return (
            self.explicit
            or bool(self.super)
            or bool(self.sub)
            or bool(self.own_prop)
            or bool(self.in_prop)
            or self.references > 0
        )

    def _delete_if_unreferenced(self):
        if not self._is_referenced():
            self.store._delete_class(self.name)


@dataclass(eq=False)
class Property:
    """An RDFS property and its links (inference.go:104-167)."""

    store: "Store"
    name: Value
    explicit: bool = False
    references: int = 0
    domain: Class | None = None
    range: Class | None = None
    super: set = field(default_factory=set)
    sub: set = field(default_factory=set)

    def is_sub_property_of(self, super_prop: "Property") -> bool:
        if self is super_prop:
            return True
        if super_prop in self.super:
            return True
        return any(s.is_sub_property_of(super_prop) for s in self.super)

    def _is_referenced(self) -> bool:
        return (
            self.explicit
            or self.references > 0
            or bool(self.super)
            or bool(self.sub)
            or self.domain is not None
            or self.range is not None
        )

    def _delete_if_unreferenced(self):
        if not self._is_referenced():
            self.store._delete_property(self.name)


class Store:
    """The inference store (inference.go:169-222 NewStore)."""

    def __init__(self):
        self.classes: dict[Value, Class] = {}
        self.properties: dict[Value, Property] = {}
        self._ensure_class(RESOURCE)

    # ---------------- lookup ----------------

    def get_class(self, name) -> Class | None:
        return self.classes.get(coerce(name))

    def get_property(self, name) -> Property | None:
        return self.properties.get(coerce(name))

    # ---------------- internals ----------------

    def _new_class(self, name: Value, explicit: bool) -> Class:
        c = Class(self, name, explicit)
        self.classes[name] = c
        return c

    def _ensure_class(self, name: Value):
        c = self.classes.get(name)
        if c is not None:
            c.explicit = True
        else:
            self._new_class(name, True)

    def _implicit_class(self, name: Value) -> Class:
        c = self.classes.get(name)
        if c is None:
            c = self._new_class(name, False)
        return c

    def _create_property(self, name: Value):
        p = self.properties.get(name)
        if p is not None:
            p.explicit = True
            return
        self.properties[name] = Property(self, name, True)

    def _implicit_property(self, name: Value) -> Property:
        p = self.properties.get(name)
        if p is None:
            p = Property(self, name, False)
            self.properties[name] = p
        return p

    def _add_class_rel(self, child: Value, parent: Value):
        p, c = self._implicit_class(parent), self._implicit_class(child)
        if c not in p.sub:
            p.sub.add(c)
            c.super.add(p)

    def _add_property_rel(self, child: Value, parent: Value):
        p, c = self._implicit_property(parent), self._implicit_property(child)
        if c not in p.sub:
            p.sub.add(c)
            c.super.add(p)

    def _set_domain(self, prop: Value, domain: Value):
        p, c = self._implicit_property(prop), self._implicit_class(domain)
        p.domain = c
        c.own_prop.add(p)

    def _set_range(self, prop: Value, rng: Value):
        p, c = self._implicit_property(prop), self._implicit_class(rng)
        p.range = c
        c.in_prop.add(p)

    def _add_class_instance(self, name: Value, n: int = 1):
        c = self.classes.get(name) or self._implicit_class(name)
        c.references += n

    def _add_property_instance(self, name: Value, n: int = 1) -> Property:
        p = self.properties.get(name) or self._implicit_property(name)
        p.references += n
        return p

    # ---------------- quad processing (inference.go:276-326) --------

    def process_quads(self, *quads):
        for q in quads:
            self._process(q)

    def _process(self, q, n: int = 1):
        s, pred, o = (coerce(q[0]), coerce(q[1]), coerce(q[2]))
        if not isinstance(pred, IRI):
            return
        if pred == TYPE:
            if isinstance(o, BNode):
                self._add_class_instance(o, n)
            elif isinstance(o, IRI):
                if o == CLASS:
                    self._ensure_class(s)
                elif o == PROPERTY:
                    self._create_property(s)
                else:
                    self._add_class_instance(o, n)
        elif pred == SUB_PROPERTY_OF:
            self._add_property_rel(s, o)
        elif pred == SUB_CLASS_OF:
            self._add_class_rel(s, o)
        elif pred == DOMAIN:
            self._set_domain(s, o)
        elif pred == RANGE:
            self._set_range(s, o)
        else:
            p = self._add_property_instance(pred, n)
            if p.domain is not None:
                p.domain.references += n
            if p.range is not None:
                p.range.references += n

    # ---------------- deletion (inference.go:328-463) ----------------

    def _delete_class(self, name: Value):
        c = self.classes.get(name)
        if c is None:
            return
        for sub in c.sub:
            sub.super.discard(c)
        for sup in c.super:
            sup.sub.discard(c)
        del self.classes[name]

    def _delete_property(self, name: Value):
        p = self.properties.get(name)
        if p is None:
            return
        for sup in p.super:
            sup.sub.discard(p)
        for sub in p.sub:
            sub.super.discard(p)
        del self.properties[name]

    def unprocess_quads(self, *quads):
        for q in quads:
            self._unprocess(q)

    def _unprocess(self, q):
        s, pred, o = (coerce(q[0]), coerce(q[1]), coerce(q[2]))
        if not isinstance(pred, IRI):
            return
        if pred == TYPE:
            if not isinstance(o, IRI):
                return
            if o == CLASS:
                self._delete_class(s)
            elif o == PROPERTY:
                self._delete_property(s)
            else:
                c = self.classes.get(o)
                if c is not None:
                    c.references -= 1
                    c._delete_if_unreferenced()
        elif pred == SUB_PROPERTY_OF:
            p, c = self.properties.get(o), self.properties.get(s)
            if p is not None and c is not None and c in p.sub:
                p.sub.discard(c)
                c.super.discard(p)
                p._delete_if_unreferenced()
                c._delete_if_unreferenced()
        elif pred == SUB_CLASS_OF:
            p, c = self.classes.get(o), self.classes.get(s)
            if p is not None and c is not None and c in p.sub:
                p.sub.discard(c)
                c.super.discard(p)
                p._delete_if_unreferenced()
                c._delete_if_unreferenced()
        elif pred == DOMAIN:
            p, c = self.properties.get(s), self.classes.get(o)
            if p is not None and c is not None:
                p.domain = None
                c.own_prop.discard(p)
                p._delete_if_unreferenced()
                c._delete_if_unreferenced()
        elif pred == RANGE:
            p, c = self.properties.get(s), self.classes.get(o)
            if p is not None and c is not None:
                p.range = None
                c.in_prop.discard(p)
                p._delete_if_unreferenced()
                c._delete_if_unreferenced()
        else:
            p = self.properties.get(pred)
            if p is not None:
                p.references -= 1
                if p.domain is not None:
                    p.domain.references -= 1
                    p.domain._delete_if_unreferenced()
                if p.range is not None:
                    p.range.references -= 1
                    p.range._delete_if_unreferenced()
                p._delete_if_unreferenced()

    # ---------------- distributed construction ----------------

    @classmethod
    def from_graph(cls, gs) -> "Store":
        """Build the schema index from a GraphStore with ONE pass of
        distributed aggregation: schema triples (rdf:type + the four
        RDFS predicates) are collected — ontology-sized — and every
        other predicate contributes only its (predicate, count)
        aggregate, standing in for the reference's per-quad
        addPropertyInstance calls."""
        from pyspark.sql import functions as F

        from .values import BNode, IRI, parse_term

        store = cls()
        rel_pids = [
            v.id for v in (SUB_CLASS_OF, SUB_PROPERTY_OF, DOMAIN, RANGE)
        ]
        decl_oids = [CLASS.id, PROPERTY.id]
        terms = gs.nodes.select("id", "term")
        # Ontology-sized collects only: the four RDFS structural
        # predicates, plus rdf:type rows that DECLARE a class/property
        # (object = rdfs:Class / rdf:Property). Instance typing
        # (x rdf:type C) is data-sized — one row per typed entity — so
        # those rows are aggregated below, never collected.
        q = gs.quads.where(
            F.col("p").isin(rel_pids)
            | ((F.col("p") == TYPE.id) & F.col("o").isin(decl_oids))
        )
        rendered = gs.resolve(q.select("s", "p", "o"))
        schema = [
            (parse_term(r["s"]), parse_term(r["p"]), parse_term(r["o"]))
            for r in rendered.collect()
        ]
        # schema first, so domains/ranges exist before usage counts
        for s, p, o in schema:
            store._process((s, p, o))
        # instance typing: (class, count) pairs — the distributed twin
        # of the reference's per-quad addClassInstance calls
        type_counts = (
            gs.quads.where(
                (F.col("p") == TYPE.id) & ~F.col("o").isin(decl_oids)
            )
            .groupBy("o")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(terms.withColumnRenamed("id", "o"), "o")
            .select("term", "n")
            .collect()
        )
        for r in type_counts:
            o = parse_term(r["term"])
            # _process counts only IRI/BNode-typed objects as classes
            if isinstance(o, (IRI, BNode)):
                store._add_class_instance(o, r["n"])
        counts = (
            gs.quads.where(
                ~F.col("p").isin(rel_pids) & (F.col("p") != TYPE.id)
            )
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(terms.withColumnRenamed("id", "p"), "p")
            .select("term", "n")
            .collect()
        )
        for r in counts:
            p = store._add_property_instance(parse_term(r["term"]), r["n"])
            if p.domain is not None:
                p.domain.references += r["n"]
            if p.range is not None:
                p.range.references += r["n"]
        return store

    # ---------------- closure views ----------------

    def _closure_rows(self, items: dict) -> list[tuple[str, str]]:
        rows = []
        for name, node in items.items():
            seen, stack = set(), list(node.super)
            while stack:
                cur = stack.pop()
                if cur in seen:
                    continue
                seen.add(cur)
                rows.append((name.term(), cur.name.term()))
                stack.extend(cur.super)
        return rows

    def subclass_closure_df(self, spark):
        """DataFrame[sub: term, super: term] — the transitive
        rdfs:subClassOf closure (rule 11), broadcastable for type
        expansion joins at scale."""
        return spark.createDataFrame(
            self._closure_rows(self.classes) or [("", "")],
            "sub string, super string",
        ).where("sub != ''")

    def subproperty_closure_df(self, spark):
        """DataFrame[sub: term, super: term] — transitive
        rdfs:subPropertyOf closure (rule 5)."""
        return spark.createDataFrame(
            self._closure_rows(self.properties) or [("", "")],
            "sub string, super string",
        ).where("sub != ''")

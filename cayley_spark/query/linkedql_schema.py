"""LinkedQL schema generation (``cayley schema linkedql``).

Re-expression of the reference's reflection-based generator
(internal/linkedql/schema/schema.go:366-376 Generate; cmd/cayley/
command/schema.go NewLinkedQLSchemaCommand): emit an OWL/JSON-LD
document describing every registered step — one ``rdfs:Class`` per
step with ``rdfs:subClassOf`` links to PathStep/IteratorStep plus
``owl:Restriction`` cardinality nodes for its fields, and one
``owl:ObjectProperty``/``owl:DatatypeProperty`` per field name whose
``rdfs:domain`` is the ``owl:unionOf`` of the classes using it.

The Go generator reflects over struct tags; Python has no step
structs, so the registry below declares the same (step, field,
range, cardinality) facts — field names and ranges mirror the
reference's ``json:"..."`` tags (query/linkedql/steps/*.go). Blank
node ids are deterministic (_:b0, _:b1, ...) instead of random,
which the JSON-LD data model treats as equivalent.
"""

from __future__ import annotations

import json

LINKEDQL = "http://cayley.io/linkedql#"
RDFG_GRAPH = "rdfg:Graph"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INT = "http://www.w3.org/2001/XMLSchema#int"
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"
RDFS_RESOURCE = "http://www.w3.org/2000/01/rdf-schema#Resource"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"
PATH_STEP = LINKEDQL + "PathStep"
ITERATOR_STEP = LINKEDQL + "IteratorStep"
PROPERTY_PATH = LINKEDQL + "PropertyPath"

# field spec: (name, range, required_single)
_FROM = ("from", PATH_STEP, True)
_STEPS = ("steps", PATH_STEP, False)
_PROPS = ("properties", PROPERTY_PATH, False)
_VALUE = ("value", RDFS_RESOURCE, True)
_NAME_S = ("name", XSD_STRING, True)

#: step -> (field specs, is path step, is iterator step, description)
#: mirrors query/linkedql/steps/*.go field tags and Description()s
STEPS: dict[str, tuple] = {
    "Vertex": ([("values", RDFS_RESOURCE, False)], True, False,
               "Vertex resolves to all the existing objects and primitive values in the graph"),
    "Placeholder": ([], True, False,
                    "Placeholder resolves to all the objects and primitive values in the context it is placed in"),
    "Match": ([_FROM, ("pattern", RDFG_GRAPH, False)], True, False,
              "Match returns all the vertices matching the pattern"),
    "Visit": ([_FROM, _PROPS], True, False,
              "Visit follows the property in the direction of the edge"),
    "VisitReverse": ([_FROM, _PROPS], True, False,
                     "VisitReverse follows the property in the reverse direction of the edge"),
    "Out": ([_FROM, _PROPS], True, False,
            "Out is an alias for Visit"),
    "In": ([_FROM, _PROPS], True, False,
           "In is an alias for VisitReverse"),
    "Both": ([_FROM, _PROPS], True, False,
             "Both follows the property in both directions of the edge"),
    "Has": ([_FROM, ("property", PROPERTY_PATH, True),
             ("values", RDFS_RESOURCE, False)], True, False,
            "Has filters out values that do not have the property with the given values"),
    "HasReverse": ([_FROM, ("property", PROPERTY_PATH, True),
                    ("values", RDFS_RESOURCE, False)], True, False,
                   "HasReverse filters out values that do not have the reverse property with the given values"),
    "Intersect": ([_FROM, _STEPS], True, False,
                  "Intersect resolves to all the same values resolved by the from step and the provided steps"),
    "Union": ([_FROM, _STEPS], True, False,
              "Union returns the combined paths of the two queries"),
    "Difference": ([_FROM, _STEPS], True, False,
                   "Difference excludes all the values resolved by the provided steps"),
    "Back": ([_FROM, _NAME_S], True, False,
             "Back resolves to the values of the previous the step or the values assigned to name in a former step"),
    "As": ([_FROM, _NAME_S], True, False,
           "As assigns the resolved values of the from step to a given name"),
    "Where": ([_FROM, ("condition", PATH_STEP, True)], True, False,
              "Where applies the provided condition to the values"),
    "Collect": ([_FROM, ("name", RDFS_RESOURCE, True)], True, False,
                "Recursively resolves values of a list (also known as RDF collection)"),
    "Optional": ([_FROM, ("step", PATH_STEP, True)], True, False,
                 "Optional attempts to follow the step, keeping values where it fails"),
    "Count": ([_FROM], True, False,
              "Count resolves to the number of the values resolved by the from step"),
    "Limit": ([_FROM, ("limit", XSD_INT, True)], True, False,
              "Limit truncates the values to the given number"),
    "Skip": ([_FROM, ("offset", XSD_INT, True)], True, False,
             "Skip skips the given number of values"),
    "Order": ([_FROM], True, False,
              "Order sorts the values in ascending order"),
    "Unique": ([_FROM], True, False,
               "Unique removes duplicate values"),
    "Like": ([_FROM, ("likePattern", XSD_STRING, True)], True, False,
             "Like filters out values that do not match the pattern"),
    "RegExp": ([_FROM, ("expression", XSD_STRING, True),
                ("includeIRIs", XSD_BOOLEAN, True)], True, False,
               "RegExp filters out values that do not match the regular expression"),
    "LessThan": ([_FROM, _VALUE], True, False,
                 "LessThan filters out values that are not less than the given value"),
    "LessThanEquals": ([_FROM, _VALUE], True, False,
                       "LessThanEquals filters out values that are not less than or equal to the given value"),
    "GreaterThan": ([_FROM, _VALUE], True, False,
                    "GreaterThan filters out values that are not greater than the given value"),
    "GreaterThanEquals": ([_FROM, _VALUE], True, False,
                          "GreaterThanEquals filters out values that are not greater than or equal to the given value"),
    "Labels": ([_FROM], True, False,
               "Labels resolves to the labels of the quads the values appear in"),
    "PropertyNames": ([_FROM], True, False,
                      "PropertyNames resolves to the property names of the values"),
    "ReversePropertyNames": ([_FROM], True, False,
                             "ReversePropertyNames resolves to the reverse property names of the values"),
    "Properties": ([_FROM, ("names", RDFS_RESOURCE, False)], True, False,
                   "Properties tags the values with the given properties"),
    "ReverseProperties": ([_FROM, ("names", RDFS_RESOURCE, False)], True, False,
                          "ReverseProperties tags the values with the given reverse properties"),
    "PropertyNamesAs": ([_FROM, ("tag", XSD_STRING, True)], True, False,
                        "PropertyNamesAs tags the property names of the values"),
    "ReversePropertyNamesAs": ([_FROM, ("tag", XSD_STRING, True)], True, False,
                               "ReversePropertyNamesAs tags the reverse property names of the values"),
    "Select": ([("properties", XSD_STRING, False), _FROM,
                ("excludeID", XSD_BOOLEAN, True)], False, True,
               "Select returns flat records of tags matched in the query"),
    "Documents": ([_FROM], False, True,
                  "Documents return documents of the tags matched in the query associated with their entity"),
}

_DATATYPES = {XSD_STRING, XSD_INT, XSD_BOOLEAN}


def generate() -> dict:
    """Build the schema document: {"@context": ..., "@graph": [...]}"""
    bn = [0]

    def blank() -> str:
        bn[0] += 1
        return f"_:b{bn[0] - 1}"

    graph: list[dict] = []
    # property name -> {range, domains [class ids], datatype?}
    props: dict[str, dict] = {}

    for step in sorted(STEPS):
        fields, is_path, is_iter, comment = STEPS[step]
        cls_id = LINKEDQL + step
        supers: list = []
        if is_path:
            supers.append({"@id": PATH_STEP})
        if is_iter:
            supers.append({"@id": ITERATOR_STEP})
        for fname, frange, single in fields:
            pid = LINKEDQL + fname
            p = props.setdefault(
                pid,
                {"range": frange, "domains": [],
                 "datatype": frange in _DATATYPES},
            )
            p["domains"].append(cls_id)
            if single:
                supers.append({
                    "@id": blank(),
                    "@type": "owl:Restriction",
                    "owl:cardinality": 1,
                    "owl:onProperty": {"@id": pid},
                })
            else:
                supers.append({
                    "@id": blank(),
                    "@type": "owl:Restriction",
                    "owl:minCardinality": 0,
                    "owl:onProperty": {"@id": pid},
                })
        graph.append({
            "@id": cls_id,
            "@type": "rdfs:Class",
            "rdfs:comment": comment,
            "rdfs:subClassOf": supers,
        })

    for pid in sorted(props):
        p = props[pid]
        domains = [{"@id": d} for d in sorted(set(p["domains"]))]
        domain = (
            domains[0]
            if len(domains) == 1
            else {
                "@id": blank(),
                "@type": "owl:Class",
                "owl:unionOf": {"@list": domains},
            }
        )
        graph.append({
            "@id": pid,
            "@type": (
                "owl:DatatypeProperty" if p["datatype"] else "owl:ObjectProperty"
            ),
            "rdfs:domain": domain,
            "rdfs:range": {"@id": p["range"]},
        })

    return {
        "@context": {
            "linkedql": LINKEDQL,
            "owl": "http://www.w3.org/2002/07/owl#",
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            "rdfg": "http://www.w3.org/2004/03/trix/rdfg-1/",
        },
        "@graph": graph,
    }


def generate_json(indent: str = "\t") -> str:
    return json.dumps(generate(), indent=indent, ensure_ascii=False)

"""cayley_spark — a PySpark-native graph analytics engine with the
query and data-processing capabilities of cayleygraph/cayley.

Quads live in DataFrames; the Cayley shape algebra compiles to
DataFrame plans and Catalyst/AQE does physical planning. See SURVEY.md
for the blueprint and reference citations.
"""

from .hashing import hash_str
from .store import GraphStore
from .values import (
    IRI,
    BNode,
    Bool,
    Float,
    Int,
    LangString,
    Raw,
    String,
    Time,
    TypedString,
    Value,
)
from .query.path import Path, start_path

__all__ = [
    "GraphStore",
    "Path",
    "start_path",
    "hash_str",
    "IRI",
    "BNode",
    "String",
    "LangString",
    "TypedString",
    "Int",
    "Float",
    "Bool",
    "Time",
    "Raw",
    "Value",
]

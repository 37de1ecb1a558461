"""Session contract: result collations + the language registry.

Re-expression of the reference's ``query.Session`` interface
(query/session.go:52-141): every language session executes a query
under one of four collations —

- ``RAW``: graph-native results (here: N-Quads term-string rows);
- ``REPL``: strings formatted for the CLI (query/gizmo/gizmo.go:
  406-458 replResult — ``****`` row separator, ``tag : term`` lines,
  ``=> value`` for scalars);
- ``JSON``: JSON-encodable natives;
- ``JSONLD``: JSON-LD-compatible values.

Languages differ in which collations they accept, exactly as in the
reference: mql supports REPL/JSON only (query/mql/session.go:96),
graphql RAW/JSON/REPL (query/graphql/graphql.go:61, REPL is the
indented-JSON string form, graphql.go:97-102), gizmo and sexp accept
all four, linkedql serves JSON/JSONLD natively.
"""

from __future__ import annotations

import json
from enum import IntEnum

from ..store import GraphStore


class Collation(IntEnum):
    RAW = 0
    REPL = 1
    JSON = 2
    JSONLD = 3


class UnsupportedCollation(ValueError):
    def __init__(self, collation: Collation):
        super().__init__(f"unsupported collation {collation.name}")


def _repl_row(r: dict) -> str:
    out = "****\n"
    for k in sorted(r):
        if k == "$_" or r[k] is None:
            continue
        out += f"{k} : {r[k]}\n"
    return out


def _collate_rows(rows: list, collation: Collation) -> list:
    """Term-string dict rows → collated output."""
    if collation == Collation.REPL:
        return [
            _repl_row(r) if isinstance(r, dict) else f"=> {r}\n" for r in rows
        ]
    return rows


class GizmoSession:
    name = "gizmo"

    def __init__(self, store: GraphStore):
        self.store = store

    def execute(
        self, query: str, limit: int = -1, collation: Collation = Collation.JSON
    ) -> list:
        from .gizmo import graph
        from .safe_eval import safe_gizmo_eval

        raw = collation in (Collation.RAW, Collation.REPL)
        g = graph(self.store, raw=raw)
        result = safe_gizmo_eval(query, g)
        out = result if isinstance(result, (list, int, str)) else g.emitted()
        if not isinstance(out, list):
            out = [out]
        if limit > 0:
            out = out[:limit]
        return _collate_rows(out, collation)


class SexpSession:
    name = "sexp"

    def __init__(self, store: GraphStore):
        self.store = store

    def execute(
        self, query: str, limit: int = -1, collation: Collation = Collation.JSON
    ) -> list:
        from .sexp import SexpSession as _Inner

        rows = _Inner(self.store).execute(query)
        if limit > 0:
            rows = rows[:limit]
        return _collate_rows(rows, collation)


class MQLSession:
    name = "mql"

    def __init__(self, store: GraphStore):
        self.store = store

    def execute(
        self, query, limit: int = -1, collation: Collation = Collation.JSON
    ) -> list:
        if collation not in (Collation.REPL, Collation.JSON):
            raise UnsupportedCollation(collation)
        from .mql import MQLSession as _Inner

        rows = _Inner(self.store).execute(query, limit=limit)
        if collation == Collation.REPL:
            return [json.dumps(r, ensure_ascii=False, default=str) + "\n" for r in rows]
        return rows


class GraphQLSession:
    name = "graphql"

    def __init__(self, store: GraphStore):
        self.store = store

    def execute(
        self, query: str, limit: int = -1, collation: Collation = Collation.JSON
    ) -> list:
        if collation not in (Collation.RAW, Collation.JSON, Collation.REPL):
            raise UnsupportedCollation(collation)
        from .graphql import GraphQLSession as _Inner

        res = _Inner(self.store).execute(query)
        if collation == Collation.REPL:
            # reference graphql.go:97-102: indented-JSON string
            return [json.dumps(res, indent=3, ensure_ascii=False, default=str)]
        return [res]


class LinkedQLSession:
    name = "linkedql"

    def __init__(self, store: GraphStore):
        self.store = store

    def execute(
        self, query, limit: int = -1, collation: Collation = Collation.JSON
    ) -> list:
        from .linkedql import LinkedQLSession as _Inner

        out = _Inner(self.store).execute(query)
        rows = out if isinstance(out, list) else [out]
        if limit > 0:
            rows = rows[:limit]
        if collation == Collation.REPL:
            return [
                json.dumps(r, ensure_ascii=False, default=str) + "\n" for r in rows
            ]
        return rows


LANGUAGES = {
    s.name: s
    for s in (GizmoSession, MQLSession, GraphQLSession, SexpSession, LinkedQLSession)
}


def get_session(store: GraphStore, lang: str):
    try:
        return LANGUAGES[lang](store)
    except KeyError:
        raise ValueError(f"unknown language {lang!r}") from None

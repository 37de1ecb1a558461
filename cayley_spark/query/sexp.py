"""Sexp — the legacy s-expression query language.

Re-expression of /root/reference/query/sexp/parser.go (~300 LoC).
Grammar (from the reference's parser tests, query/sexp/parser_test.go):

    pattern    := '(' subject constraint* ')'
    subject    := '$tag' | value
    constraint := '(' ':pred' object ')'
    object     := value | '$tag' | pattern
    value      := '"literal"' | ':name' | '<iri>' | '_:bnode'

A ``$tag`` subject scans all nodes and tags them; a value subject pins
the node. Each constraint is a NodesFrom(Subject, Quads(pred, object))
semi-structure intersected with the subject set — identical shape
trees to the reference (parser_test.go golden shapes)."""

from __future__ import annotations

import re

from .. import shapes as S
from ..store import GraphStore
from ..values import String, Value, coerce

_TOKEN = re.compile(
    r"""\s*(?:(?P<open>\()
        |(?P<close>\))
        |(?P<str>"(?:[^"\\]|\\.)*")
        |(?P<tag>\$[A-Za-z0-9_]+)
        |(?P<name>:[^\s()]+)
        |(?P<iri><[^>\s]*>)
        |(?P<bnode>_:[^\s()]+))""",
    re.X,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            if src[i:].strip():
                raise ValueError(f"sexp: bad token at {src[i:i+20]!r}")
            break
        i = m.end()
        toks.append((m.lastgroup, m.group(m.lastgroup)))
    return toks


def _value(kind: str, tok: str) -> Value:
    if kind == "str":
        return String(tok[1:-1].replace('\\"', '"'))
    if kind == "name":
        return coerce(tok[1:]) if tok[1:].startswith("<") else String(tok[1:])
    return coerce(tok)  # <iri> / _:bnode via parse_term


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.pos = 0

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def pattern(self) -> S.Shape:
        k, _ = self.next()
        assert k == "open", "sexp: expected ("
        k, tok = self.next()
        if k == "close":
            # "()" — the reference parses this to Null (empty result)
            return S.Fixed(())
        base: S.Shape
        tag = None
        if k == "tag":
            base = S.AllNodes()
            tag = tok  # reference keeps the "$" in tag names
        else:
            base = S.Intersect((S.AllNodes(), S.Fixed((_value(k, tok),))))
        constraints = []
        while self.peek()[0] == "open":
            constraints.append(self.constraint())
        k, _ = self.next()
        assert k == "close", "sexp: expected )"
        shape = base
        if constraints:
            inner = (
                constraints[0]
                if len(constraints) == 1
                else S.Intersect(tuple(constraints))
            )
            if isinstance(base, S.AllNodes):
                shape = inner
            else:
                shape = S.Intersect((base, inner))
        if tag is not None:
            shape = S.Tag(shape, (tag,))
        return shape

    def constraint(self) -> S.Shape:
        k, _ = self.next()
        assert k == "open"
        k, tok = self.next()
        assert k == "name", "sexp: constraint must start with :pred"
        pred = _value(k, tok)
        k2, tok2 = self.peek()
        if k2 == "open":
            obj: S.Shape = self.pattern()
        else:
            self.next()
            if k2 == "tag":
                obj = S.Tag(S.AllNodes(), (tok2,))
            else:
                obj = S.Fixed((_value(k2, tok2),))
        k3, _ = self.next()
        assert k3 == "close", "sexp: expected ) after constraint"
        return S.NodesFrom(
            S.SUBJECT,
            S.Quads(
                (
                    S.QuadFilter(S.PREDICATE, S.Fixed((pred,))),
                    S.QuadFilter(S.OBJECT, obj),
                )
            ),
        )


def parse(src: str) -> S.Shape:
    toks = _tokenize(src)
    if not toks:
        return S.Fixed(())
    return _Parser(toks).pattern()


class SexpSession:
    def __init__(self, store: GraphStore):
        self.store = store

    def execute(self, query: str) -> list[dict]:
        from ..plans.compiler import compile_nodes

        shape = parse(query)
        df = compile_nodes(self.store, shape)
        out = self.store.resolve(df)
        cols = [c for c in df.columns if not c.startswith("__")]
        return [r.asDict() for r in out.select(*cols).collect()]

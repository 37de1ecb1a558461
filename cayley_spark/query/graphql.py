"""GraphQL-like nested query language.

Re-expression of the reference's GraphQL flavor
(/root/reference/query/graphql/graphql.go — parser tweaks :33-49,
field conversion :443-561, execution `iterateObject` :156-396). The
reference executes one correlated path query per nesting level and
stitches JSON client-side; here every nesting level is ONE DataFrame
program (edge join + groupBy(parent).agg(sort_array(collect_list(
struct(...))))), so a query over 10^9 nodes is a handful of shuffles,
not N driver round-trips.

Surface (mirrors query/graphql/graphql_test.go):

    {
      me(status: "cool_person", first: 10, offset: 2) {
        id                       # ValueKey — the node itself
        follows { id status }    # nested object(s)
        followed: follows @rev { id }
        name @opt                # optional leaf (doesn't filter)
        status @label(v: <sg>)   # label-constrained edge
        pic @unnest { uri }      # merge child keys into parent
        sub {*}                  # expand all out-predicates
      }
    }

Semantics (validated against the reference tests):
- field args are Has-constraints; ``id: <x>`` pins the node; ``first``/
  ``offset`` paginate that level (term order — the reference's
  iteration order is backend-dependent, term order is deterministic);
- a non-optional LEAF with zero values drops its object; nested
  object fields never filter their parent (empty → null);
- single-element results collapse to a scalar/object, multi-element
  stay lists (the reference's singleton collapse);
- ``~pred`` / ``@rev`` / ``@reverse`` traverse edges backwards;
- values render as N-Quads terms (engine-wide result convention).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, functions as F

from ..store import GraphStore
from ..values import IRI, Value, coerce

ValueKey = "id"
LimitKey = "first"
SkipKey = "offset"


# ---------------------------------------------------------------
# AST + parser
# ---------------------------------------------------------------


@dataclass
class Field:
    via: str  # predicate name ('' for expand-all marker)
    alias: str
    rev: bool = False
    opt: bool = False
    unnest: bool = False
    all_fields: bool = False
    labels: tuple[Value, ...] = ()
    has: tuple[tuple[str, bool, tuple[Value, ...]], ...] = ()  # (pred, rev, vals)
    limit: int = -1
    skip: int = 0
    fields: tuple["Field", ...] = ()


_TOKEN = re.compile(
    r"""\s*(?:(?P<punc>[{}():\[\],@*~])
        |(?P<str>"(?:[^"\\]|\\.)*")
        |(?P<iri><[^>\s]*>)
        |(?P<bnode>_:[A-Za-z0-9_]+)
        |(?P<num>-?\d+(?:\.\d+)?)
        |(?P<name>[A-Za-z_](?:[A-Za-z0-9_.:/#-]*[A-Za-z0-9_./#-])?))""",
    re.X,
)


class _Lexer:
    def __init__(self, src: str):
        self.toks: list[tuple[str, str]] = []
        i = 0
        src = re.sub(r"#[^\n]*", "", src)
        while i < len(src):
            m = _TOKEN.match(src, i)
            if not m:
                if src[i:].strip():
                    raise ValueError(f"graphql: bad token at {src[i:i+20]!r}")
                break
            i = m.end()
            kind = m.lastgroup
            self.toks.append((kind, m.group(kind)))
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ValueError(f"graphql: expected {val!r}, got {v!r}")


def _arg_value(kind: str, tok: str) -> Value:
    if kind == "str":
        body = tok[1:-1].replace('\\"', '"')
        if body.startswith("<") and body.endswith(">"):
            return IRI(body[1:-1])
        return coerce(body)
    if kind == "iri":
        return IRI(tok[1:-1])
    if kind == "bnode":
        from ..values import BNode

        return BNode(tok[2:])
    if kind == "num":
        return coerce(float(tok) if "." in tok else int(tok))
    return IRI(tok)  # bare token → IRI (me(id: fred))


def _parse_args(lx: _Lexer) -> list[tuple[str, Value | list[Value]]]:
    args: list[tuple[str, Value | list[Value]]] = []
    lx.expect("(")
    while True:
        k, v = lx.next()
        if v == ")":
            break
        if v == ",":
            continue
        key = v[1:-1] if k == "iri" else v
        lx.expect(":")
        nk, nv = lx.next()
        if nv == "[":
            vals = []
            while True:
                ek, ev = lx.next()
                if ev == "]":
                    break
                if ev == ",":
                    continue
                vals.append(_arg_value(ek, ev))
            args.append((key, vals))
        else:
            args.append((key, _arg_value(nk, nv)))
    return args


def _parse_field(lx: _Lexer) -> Field:
    k, name = lx.next()
    if name == "*":
        return Field(via="", alias="*", all_fields=True)
    if k == "iri":
        name = name[1:-1]
    alias = name
    via = name
    rev = False
    if lx.peek()[1] == ":":
        lx.next()
        vk, vname = lx.next()
        if vname == "~":
            rev = True
            vk, vname = lx.next()
        via = vname[1:-1] if vk == "iri" else vname
    elif name == "~":
        rev = True
        k2, name2 = lx.next()
        via = alias = name2[1:-1] if k2 == "iri" else name2
    has: list = []
    limit, skip = -1, 0
    pin_vals: list[Value] = []
    if lx.peek()[1] == "(":
        for key, val in _parse_args(lx):
            vals = val if isinstance(val, list) else [val]
            if key == LimitKey:
                limit = int(vals[0].native())
            elif key == SkipKey:
                skip = int(vals[0].native())
            elif key == ValueKey:
                pin_vals.extend(vals)
            else:
                has.append((key, False, tuple(vals)))
    opt = unnest = False
    labels: tuple[Value, ...] = ()
    while lx.peek()[1] == "@":
        lx.next()
        _, dname = lx.next()
        dargs = _parse_args(lx) if lx.peek()[1] == "(" else []
        if dname in ("rev", "reverse"):
            if dargs:  # @rev(pred: val) — reverse Has constraints
                for key, val in dargs:
                    vals = val if isinstance(val, list) else [val]
                    has.append((key, True, tuple(vals)))
            else:
                rev = True
        elif dname == "opt" or dname == "optional":
            opt = True
        elif dname == "unnest":
            unnest = True
        elif dname == "label":
            labels = tuple(
                v
                for _, val in dargs
                for v in (val if isinstance(val, list) else [val])
            )
    fields: tuple[Field, ...] = ()
    if lx.peek()[1] == "{":
        lx.next()
        fs = []
        while lx.peek()[1] != "}":
            if lx.peek()[1] == ",":
                lx.next()
                continue
            fs.append(_parse_field(lx))
        lx.expect("}")
        fields = tuple(fs)
    if pin_vals:
        has.append((ValueKey, False, tuple(pin_vals)))
    return Field(
        via=via,
        alias=alias,
        rev=rev,
        opt=opt,
        unnest=unnest,
        labels=labels,
        has=tuple(has),
        limit=limit,
        skip=skip,
        fields=fields,
    )


def parse(src: str) -> list[Field]:
    lx = _Lexer(src)
    lx.expect("{")
    out = []
    while lx.peek()[1] != "}":
        if lx.peek()[1] == ",":
            lx.next()
            continue
        out.append(_parse_field(lx))
    return out


# ---------------------------------------------------------------
# execution
# ---------------------------------------------------------------


class GraphQLSession:
    def __init__(self, store: GraphStore):
        self.store = store

    def execute(self, query: str) -> dict:
        out = {}
        for f in parse(query):
            df = self._object_df(f, roots=None)
            rows = [r.asDict(recursive=True) for r in df.collect()]
            objs = [self._render(r["__obj"], f) for r in rows]
            objs.sort(key=lambda o: _sort_key(o))
            out[f.alias] = _collapse(objs)
        return out

    # -------- plan construction --------

    def _edges(self, pred: str, rev: bool, labels) -> DataFrame:
        st = self.store
        q = st.quads.where(F.col("p") == F.lit(IRI(pred).id))
        if labels:
            q = q.where(F.col("l").isin([v.id for v in labels]))
        src, dst = ("o", "s") if rev else ("s", "o")
        return q.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))

    def _apply_has(self, df: DataFrame, f: Field) -> DataFrame:
        for pred, rev, vals in f.has:
            ids = [v.id for v in vals]
            if pred == ValueKey:
                df = df.where(F.col("id").isin(ids))
                continue
            hop = self._edges(pred, rev, ()).where(F.col("__dst").isin(ids))
            df = df.join(
                hop.select(F.col("__src").alias("id")), "id", "left_semi"
            )
        return df

    def _page(self, df: DataFrame, f: Field) -> DataFrame:
        """Per-level first/offset in node-term order (deterministic
        replacement for the reference's backend iteration order)."""
        if f.limit < 0 and f.skip <= 0:
            return df
        terms = self.store.nodes.select("id", F.col("term").alias("__t"))
        df = df.join(terms, "id", "left").orderBy("__t").drop("__t")
        if f.skip > 0:
            df = df.offset(f.skip)
        if f.limit >= 0:
            df = df.limit(f.limit)
        return df

    def _object_df(self, f: Field, roots: DataFrame | None) -> DataFrame:
        """DataFrame[id, __obj: struct] of rendered objects for the
        node set (roots, or all nodes at top level) that SURVIVE this
        field's own leaf constraints."""
        st = self.store
        nodes = roots if roots is not None else st.nodes.select("id")
        nodes = self._apply_has(nodes, f)
        if roots is None:
            # top level pages the node set; nested first/offset is
            # per-parent and happens on the collected array instead
            nodes = self._page(nodes, f)
        terms = st.nodes.select("id", "term")
        out = nodes.join(terms, "id", "inner")  # id, term
        struct_cols = [F.col("term").alias("__id")]
        for i, sub in enumerate(f.fields):
            col = f"__f{i}"
            if sub.all_fields:
                out = self._attach_expand_all(out, col)
                struct_cols.append(F.col(col))
                continue
            if sub.via == ValueKey and not sub.fields:
                out = out.withColumn(col, F.array(F.col("term")))
                struct_cols.append(F.col(col))
                continue
            if not sub.fields:
                out = self._attach_leaf(out, sub, col)
                if not sub.opt:
                    out = out.where(F.size(F.coalesce(F.col(col), F.array())) > 0)
            else:
                out = self._attach_object(out, sub, col)
            struct_cols.append(F.col(col))
        return out.select("id", F.struct(*struct_cols).alias("__obj"))

    def _attach_leaf(self, out: DataFrame, sub: Field, col: str) -> DataFrame:
        terms = self.store.nodes.select(
            F.col("id").alias("__vid"), F.col("term").alias("__vterm")
        )
        vals = (
            self._edges(sub.via, sub.rev, sub.labels)
            .join(terms, F.col("__dst") == F.col("__vid"))
            .groupBy("__src")
            .agg(F.sort_array(F.collect_list("__vterm")).alias(col))
        )
        vals = vals.withColumn(col, _slice_page(F.col(col), sub))
        return out.join(
            vals, out["id"] == vals["__src"], "left_outer"
        ).drop("__src")

    def _attach_object(self, out: DataFrame, sub: Field, col: str) -> DataFrame:
        edges = self._edges(sub.via, sub.rev, sub.labels)
        children = edges.select(F.col("__dst").alias("id")).dropDuplicates(["id"])
        cobjs = self._object_df(sub, roots=children)  # id, __obj
        joined = (
            edges.join(
                cobjs.withColumnRenamed("id", "__cid"),
                F.col("__dst") == F.col("__cid"),
            )
            .groupBy("__src")
            .agg(F.sort_array(F.collect_list("__obj")).alias(col))
        )
        joined = joined.withColumn(col, _slice_page(F.col(col), sub))
        return out.join(
            joined, out["id"] == joined["__src"], "left_outer"
        ).drop("__src")

    def _attach_expand_all(self, out: DataFrame, col: str) -> DataFrame:
        st = self.store
        pterms = st.nodes.select(
            F.col("id").alias("__pid"), F.col("term").alias("__pterm")
        )
        vterms = st.nodes.select(
            F.col("id").alias("__vid"), F.col("term").alias("__vterm")
        )
        pairs = (
            st.quads.select("s", "p", "o")
            .join(pterms, F.col("p") == F.col("__pid"))
            .join(vterms, F.col("o") == F.col("__vid"))
            .groupBy("s")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("__pterm", "__vterm"))
                ).alias(col)
            )
        )
        return out.join(pairs, out["id"] == pairs["s"], "left_outer").drop("s")

    # -------- rendering --------

    def _render(self, obj: dict, f: Field):
        res: dict = {}
        for i, sub in enumerate(f.fields):
            col = f"__f{i}"
            v = obj.get(col)
            if sub.all_fields:
                res[ValueKey] = obj["__id"]
                for pair in v or []:
                    p = pair["__pterm"].strip("<>")
                    res.setdefault(p, []).append(pair["__vterm"])
                for k in list(res.keys()):
                    if isinstance(res[k], list):
                        res[k] = _collapse(sorted(res[k]))
                continue
            if sub.via == ValueKey and not sub.fields:
                res[sub.alias] = obj["__id"]
            elif not sub.fields:
                if v is None or v == []:
                    if not sub.opt:
                        res[sub.alias] = None
                    continue
                res[sub.alias] = _collapse(v)
            else:
                objs = [self._render(x, sub) for x in (v or [])]
                if sub.unnest:
                    # reference graphql.go:373-377: unnesting multiple
                    # objects is an error unless limited to one
                    if len(objs) > 1:
                        raise ValueError(
                            f"cannot unnest more than one object on "
                            f"{sub.alias!r}; use (first: 1) to force"
                        )
                    for o in objs:
                        for k, val in o.items():
                            res[k] = val
                else:
                    res[sub.alias] = _collapse(objs) if objs else None
        return res


def _slice_page(col, sub: Field):
    if sub.limit < 0 and sub.skip <= 0:
        return col
    start = sub.skip + 1
    length = sub.limit if sub.limit >= 0 else (1 << 30)
    return F.slice(col, start, length)


def _collapse(xs: list):
    if not xs:
        return None
    return xs[0] if len(xs) == 1 else xs


def _sort_key(o) -> str:
    if isinstance(o, dict):
        return str(o.get(ValueKey, sorted(o.items())))
    return str(o)


def graphql_query(store: GraphStore, query: str) -> dict:
    return GraphQLSession(store).execute(query)

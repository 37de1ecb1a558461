"""MQL — Freebase-style JSON template queries.

Re-expression of the reference's MQL session
(/root/reference/query/mql/build_iterator.go:56-168 — JSON object →
IntersectOpt of per-key NodesFrom(predicate) constraints;
/root/reference/query/mql/fill.go:25-119 — result tree-ification).

Template semantics (mirrors query/mql/mql_test.go):

- ``[{...}]`` at top level: one result dict per matching node.
- key ``"id"``: ``null`` → output the node term; a string → pin the
  node to that value.
- other keys are predicates: ``"<pred>"`` or ``"pred"``; ``"!"``
  prefix reverses direction; an ``"@tag:"`` prefix renames the output
  key (allowing two constraints on the same predicate).
- key values:
  - scalar → constraint (node has edge via pred to that value), the
    scalar is echoed in the output;
  - ``null`` → OPTIONAL single-value output (null when absent);
  - ``[]`` → output all values as a sorted list (non-filtering);
  - ``{...}`` → nested query: FILTERS (inner join) and outputs one
    matching sub-object (the reference picks an arbitrary path; we
    pick the minimum neighbor term for determinism);
  - ``[{...}]`` → nested query: filters, outputs ALL matching
    sub-objects sorted by their ``id`` term.

Execution is one DataFrame program per template: constraints become
semi-joins, outputs become left-join + groupBy(collect_list/min), and
nested levels recurse bottom-up — no per-node driver loops, so a
template over 10^9 nodes is still three shuffles per nesting level.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, functions as F

from .. import shapes as S
from ..plans.compiler import compile_nodes
from ..store import GraphStore
from ..values import IRI, coerce


def _parse_key(key: str) -> tuple[str, str, bool]:
    """key → (output_key, predicate_name, reverse)."""
    out_key = key
    if key.startswith("@"):
        # "@A:<follows>" — alias tag before the colon
        _, _, key = key.partition(":")
    rev = key.startswith("!")
    if rev:
        key = key[1:]
    pred = key[1:-1] if key.startswith("<") and key.endswith(">") else key
    return out_key, pred, rev


def _term_value(v: Any):
    """JSON scalar → graph value (strings in <> parse as IRIs, like
    the reference's quad.StringToValue on MQL literals)."""
    return coerce(v)


class MQLSession:
    """Executes MQL JSON templates against a GraphStore."""

    def __init__(self, store: GraphStore):
        self.store = store

    # ---------------- public API ----------------

    def execute(self, query: str | list | dict, limit: int = -1) -> list[dict]:
        q = json.loads(query) if isinstance(query, str) else query
        if isinstance(q, list):
            if len(q) != 1 or not isinstance(q[0], dict):
                raise ValueError("MQL top level must be [{...}] or {...}")
            q = q[0]
        df = self._result_df(q)
        if limit > 0:
            df = df.limit(limit)
        rows = df.collect()
        return [self._row_to_dict(r.asDict(recursive=True), q) for r in rows]

    def execute_df(self, query: str | list | dict) -> DataFrame:
        q = json.loads(query) if isinstance(query, str) else query
        if isinstance(q, list):
            q = q[0]
        return self._result_df(q)

    # ---------------- compilation ----------------

    def _pattern_nodes(self, pat: dict) -> DataFrame:
        """Node set matching the pattern's CONSTRAINTS (scalar values,
        nested objects); outputs don't filter. DataFrame[id]."""
        st = self.store
        shape: S.Shape = S.AllNodes()
        df = compile_nodes(st, shape).select("id")
        for key, val in pat.items():
            if key == "id":
                if val is not None:
                    df = df.where(F.col("id") == F.lit(_term_value(val).id))
                continue
            _, pred, rev = _parse_key(key)
            # node side (start) / value side (goal) of the edge
            start, goal = (S.SUBJECT, S.OBJECT) if not rev else (S.OBJECT, S.SUBJECT)
            if val is None or val == []:
                continue  # pure output
            if isinstance(val, dict) or (
                isinstance(val, list) and val and isinstance(val[0], dict)
            ):
                sub = val[0] if isinstance(val, list) else val
                nbr = self._pattern_nodes(sub)
                hop = (
                    st.quads.where(F.col("p") == F.lit(IRI(pred).id))
                    .join(nbr.withColumnRenamed("id", "__n"),
                          F.col(goal) == F.col("__n"), "left_semi")
                    .select(F.col(start).alias("id"))
                )
                df = df.join(hop, "id", "left_semi")
            else:
                hop = (
                    st.quads.where(
                        (F.col("p") == F.lit(IRI(pred).id))
                        & (F.col(goal) == F.lit(_term_value(val).id))
                    ).select(F.col(start).alias("id"))
                )
                df = df.join(hop, "id", "left_semi")
        return df

    def _result_df(self, pat: dict) -> DataFrame:
        """DataFrame with one row per matching node: column ``id`` =
        node term plus one column per output key (positionally named
        __o0, __o1, ... — JSON keys aren't valid column names)."""
        st = self.store
        ids = self._pattern_nodes(pat)
        out = ids.join(st.nodes.select("id", "term"), "id", "inner")
        terms = st.nodes.select(
            F.col("id").alias("__nid"), F.col("term").alias("__nterm")
        )
        for i, (key, val) in enumerate(pat.items()):
            if key == "id":
                continue
            _, pred, rev = _parse_key(key)
            start, goal = (S.SUBJECT, S.OBJECT) if not rev else (S.OBJECT, S.SUBJECT)
            col = f"__o{i}"
            edges = st.quads.where(F.col("p") == F.lit(IRI(pred).id)).select(
                F.col(start).alias("__src"), F.col(goal).alias("__dst")
            )
            if val is None or val == []:
                vals = (
                    edges.join(terms, F.col("__dst") == F.col("__nid"))
                    .groupBy("__src")
                    .agg(
                        F.min("__nterm").alias("__one"),
                        F.sort_array(F.collect_list("__nterm")).alias("__many"),
                    )
                    .select(
                        "__src",
                        (F.col("__one") if val is None else F.col("__many")).alias(col),
                    )
                )
                out = out.join(
                    vals, out["id"] == vals["__src"], "left_outer"
                ).drop("__src")
            elif isinstance(val, (dict, list)):
                sub = val[0] if isinstance(val, list) else val
                nested = self._result_df(sub)  # id, term, __o*
                nested_struct = nested.select(
                    F.col("id").alias("__nid2"),
                    F.struct(
                        *[c for c in nested.columns if c != "id"]
                    ).alias("__obj"),
                )
                joined = (
                    edges.join(
                        nested_struct, F.col("__dst") == F.col("__nid2")
                    )
                    .groupBy("__src")
                    .agg(
                        F.min("__obj").alias("__one"),
                        F.sort_array(F.collect_list("__obj")).alias("__many"),
                    )
                    .select(
                        "__src",
                        (
                            F.col("__one")
                            if isinstance(val, dict)
                            else F.col("__many")
                        ).alias(col),
                    )
                )
                # nested objects FILTER (inner join)
                out = out.join(
                    joined, out["id"] == joined["__src"], "inner"
                ).drop("__src")
            else:
                out = out.withColumn(col, F.lit(val))
        return out

    # ---------------- result assembly ----------------

    def _row_to_dict(self, row: dict, pat: dict) -> dict:
        res: dict = {}
        for i, (key, val) in enumerate(pat.items()):
            if key == "id":
                res["id"] = row.get("term")
                continue
            col = f"__o{i}"
            v = row.get(col)
            if isinstance(val, dict):
                res[key] = self._struct_to_dict(v, val)
            elif isinstance(val, list) and val and isinstance(val[0], dict):
                res[key] = [self._struct_to_dict(x, val[0]) for x in (v or [])]
            else:
                res[key] = v
        return res

    def _struct_to_dict(self, struct: dict | None, pat: dict) -> dict | None:
        if struct is None:
            return None
        return self._row_to_dict(struct, pat)

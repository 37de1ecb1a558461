"""LinkedQL golden corpus: the reference's steps/test-cases/*.json run
wholesale (reference query/linkedql/steps/steps_test.go). Each case is
{data: JSON-LD document, query: LinkedQL step object, results}.

The expander below covers exactly the JSON-LD subset the corpus uses:
@context {@base, @vocab}, @graph, @id, nested node objects, @list
collections (rdf:first/rest chains), string/number/bool literals.
"""

from __future__ import annotations

import json
from pathlib import Path as FSPath

import pytest

from cayley_spark import GraphStore
from cayley_spark.query.linkedql import RDF, LinkedQLSession
from cayley_spark.values import BNode, Bool, Float, IRI, Int, String

CASES_DIR = FSPath(__file__).parent / "data" / "linkedql_cases"

# count.json expects 4 for a 1-triple graph whose dictionary holds 3
# values (alice, likes, bob) — the reference harness loads the case
# through a JSON-LD reader whose default-graph label lands in the
# memstore value dictionary, so `Count(Match{})` sees a 4th entry.
# This engine stores the default graph as NULL (no label node), so
# the semantic answer is 3. Pinned as a DIVERGENCE (asserted, not
# skipped): if either engine's behavior drifts, this fails loudly.
DIVERGENT = {"count.json": [3]}


def expand_jsonld(data: dict) -> list[tuple]:
    """Tiny JSON-LD → quad expansion for the golden corpus subset."""
    ctx = data.get("@context", {})
    base, vocab = ctx.get("@base", ""), ctx.get("@vocab", "")
    quads: list[tuple] = []
    n_bnodes = [0]

    def bnode() -> BNode:
        n_bnodes[0] += 1
        return BNode(f"b{n_bnodes[0]}")

    def norm_id(s: str) -> str:
        return s if "://" in s or s.startswith("_:") else base + s

    def lit(v):
        if isinstance(v, bool):
            return Bool(v)
        if isinstance(v, int):
            return Int(v)
        if isinstance(v, float):
            return Float(v)
        return String(v)

    def value(v):
        if isinstance(v, dict):
            if "@list" in v:
                items = [value(x) for x in v["@list"]]
                if not items:
                    return IRI(RDF + "nil")
                cells = [bnode() for _ in items]
                for i, (c, it) in enumerate(zip(cells, items)):
                    quads.append((c, IRI(RDF + "first"), it))
                    nxt = cells[i + 1] if i + 1 < len(cells) else IRI(RDF + "nil")
                    quads.append((c, IRI(RDF + "rest"), nxt))
                return cells[0]
            if "@value" in v:
                return lit(v["@value"])
            return node(v)
        return lit(v)

    def node(obj: dict):
        subj = IRI(norm_id(obj["@id"])) if "@id" in obj else bnode()
        for k, v in obj.items():
            if k.startswith("@"):
                continue
            pred = IRI(k if "://" in k else vocab + k)
            for val in v if isinstance(v, list) else [v]:
                quads.append((subj, pred, value(val)))
        return subj

    for obj in data["@graph"] if "@graph" in data else [data]:
        node(obj)
    return quads


def canon(x):
    """Order-insensitive comparison key for result JSON."""
    if isinstance(x, list):
        return sorted(json.dumps(e, sort_keys=True) for e in x)
    return json.dumps(x, sort_keys=True)


@pytest.mark.parametrize(
    "case", sorted(p.name for p in CASES_DIR.glob("*.json"))
)
def test_linkedql_golden(spark, case):
    doc = json.loads((CASES_DIR / case).read_text())
    quads = expand_jsonld(doc["data"])
    store = GraphStore.from_quad_values(spark, quads)
    got = LinkedQLSession(store).execute(doc["query"])
    want = DIVERGENT.get(case, doc["results"])
    assert canon(got) == canon(want), (
        f"{case}: got {got!r}, want {want!r}"
    )

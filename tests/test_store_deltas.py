"""Incremental persisted-store maintenance (GraphStore.save_deltas /
compact): the append-only delta-log counterpart of the reference's
incremental backend writes (graph/kv/indexing.go:409-480 batch write
path; graph/sql/database.go upserts). The pinned claims:

1. a delta write leaves every existing base file BYTE-IDENTICAL
   (pure appends — O(delta), never O(store));
2. load() of base+log is semantically identical to apply_deltas
   replayed in batch order (differential, including delete-then-readd
   sequencing, duplicate-copy bag deletes, and orphan dropping);
3. compact() folds the log into the base layout and clears it.
"""

import hashlib
import os

import pytest

from cayley_spark import GraphStore, IRI, String

from .conftest import SIMPLE_SOCIAL, _i


def _file_hashes(root: str) -> dict[str, str]:
    out = {}
    for r, _, fs in os.walk(root):
        for f in fs:
            p = os.path.join(r, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.sha256(
                    fh.read()
                ).hexdigest()
    return out


def _quad_terms(store) -> list[tuple]:
    """Resolved (s,p,o,l) term multiset — id-independent comparison."""
    rows = store.resolve(store.quads).collect()
    return sorted(
        ((r["s"], r["p"], r["o"], r["l"]) for r in rows),
        key=lambda t: tuple(x or "" for x in t),
    )


def _node_state(store) -> dict[str, int]:
    return {
        r["term"]: r["refs"] for r in store.nodes.collect()
    }


def _assert_equivalent(got, want):
    """Quad multiset and dictionary MEMBERSHIP must match exactly.
    refs values are compared only as >= 1: the node refcount is loose
    by design (base rows all write refs=1 regardless of usage) and
    apply_deltas clamps at 1 per batch while the log merge sums once
    and clamps once — a documented divergence with no consumer
    (nothing outside store bookkeeping reads refs)."""
    assert _quad_terms(got) == _quad_terms(want)
    gs, ws = _node_state(got), _node_state(want)
    assert set(gs) == set(ws)
    assert all(v >= 1 for v in gs.values())


def test_save_deltas_leaves_base_files_byte_identical(spark, tmp_path):
    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    before = {
        sub: _file_hashes(os.path.join(path, sub))
        for sub in ("quads", "nodes")
    }
    add = [(_i("harry"), _i("follows"), _i("alice"))]
    delete = [(_i("emily"), _i("follows"), _i("fred"))]
    batch = GraphStore.save_deltas(spark, path, add=add, delete=delete)
    assert batch == 1
    after = {
        sub: _file_hashes(os.path.join(path, sub))
        for sub in ("quads", "nodes")
    }
    assert before == after  # base untouched, byte for byte
    assert os.path.isdir(os.path.join(path, "delta", "adds"))
    assert os.path.isdir(os.path.join(path, "delta", "dels"))
    # second batch appends — base still untouched
    GraphStore.save_deltas(
        spark, path, add=[(_i("harry"), _i("follows"), _i("bob"))]
    )
    assert before == {
        sub: _file_hashes(os.path.join(path, sub))
        for sub in ("quads", "nodes")
    }


def test_delta_log_load_matches_apply_deltas(spark, tmp_path):
    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    b1_add = [
        (_i("harry"), _i("follows"), _i("alice")),
        (_i("harry"), _i("status"), String("cool_person")),
    ]
    b1_del = [(_i("emily"), _i("follows"), _i("fred"))]
    GraphStore.save_deltas(spark, path, add=b1_add, delete=b1_del)
    want = st.apply_deltas(add=b1_add, delete=b1_del)
    _assert_equivalent(GraphStore.load(spark, path), want)

    # batch 2: delete a batch-1 add, and an add in the same batch as
    # its delete dies (apply_deltas ordering: adds first)
    b2_add = [(_i("zoe"), _i("follows"), _i("harry"))]
    b2_del = [
        (_i("harry"), _i("follows"), _i("alice")),
        (_i("zoe"), _i("follows"), _i("harry")),
    ]
    GraphStore.save_deltas(spark, path, add=b2_add, delete=b2_del)
    want = want.apply_deltas(add=b2_add, delete=b2_del)
    _assert_equivalent(GraphStore.load(spark, path), want)

    # batch 3: RE-ADD a quad tombstoned in an earlier batch — the
    # later-batch add must survive the batch-2 tombstone
    b3_add = [(_i("harry"), _i("follows"), _i("alice"))]
    GraphStore.save_deltas(spark, path, add=b3_add)
    want = want.apply_deltas(add=b3_add)
    _assert_equivalent(GraphStore.load(spark, path), want)


def test_delta_log_orphans_and_duplicate_copies(spark, tmp_path):
    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    # duplicate copies: two identical adds, one delete kills both
    dup = (_i("x"), _i("follows"), _i("alice"))
    GraphStore.save_deltas(spark, path, add=[dup, dup])
    GraphStore.save_deltas(spark, path, delete=[dup])
    want = st.apply_deltas(add=[dup, dup]).apply_deltas(delete=[dup])
    got = GraphStore.load(spark, path)
    _assert_equivalent(got, want)
    # <x> became an orphan and is gone from the dictionary
    assert "<x>" not in _node_state(got)
    # emily orphans when her only quads go (one is in smart_graph)
    GraphStore.save_deltas(
        spark,
        path,
        delete=[
            (_i("emily"), _i("follows"), _i("fred")),
            (
                _i("emily"),
                _i("status"),
                String("smart_person"),
                _i("smart_graph"),
            ),
        ],
    )
    got = GraphStore.load(spark, path)
    assert "<emily>" not in _node_state(got)
    # label-bearing sibling quads survive the unlabeled delete rule
    assert ("<greg>", "<status>", '"smart_person"', "<smart_graph>") in (
        _quad_terms(got)
    )


def test_compact_folds_log_and_clears_it(spark, tmp_path):
    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    add = [(_i("harry"), _i("follows"), _i("alice"))]
    delete = [(_i("emily"), _i("follows"), _i("fred"))]
    GraphStore.save_deltas(spark, path, add=add, delete=delete)
    want = st.apply_deltas(add=add, delete=delete)
    compacted = GraphStore.compact(spark, path)
    assert not os.path.exists(os.path.join(path, "delta"))
    assert not os.path.exists(os.path.join(path, "quads.compact.tmp"))
    _assert_equivalent(compacted, want)
    # a reload sees the folded base with no merge applied
    _assert_equivalent(GraphStore.load(spark, path), want)
    # batch numbering is MONOTONE across compactions (the folded-
    # through watermark survives the log delete): the next batch
    # numbers past the folded one, never reusing an id the watermark
    # covers — that is what makes a crash-resurrected log safe
    assert GraphStore.save_deltas(
        spark, path, add=[(_i("zoe"), _i("follows"), _i("harry"))]
    ) == 2


def test_save_overwrite_clears_stale_delta_log(spark, tmp_path):
    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    GraphStore.save_deltas(
        spark, path, add=[(_i("harry"), _i("follows"), _i("alice"))]
    )
    # full overwrite of the same path: the stale log must not be
    # re-applied to the new base
    fresh = GraphStore.from_quad_values(
        spark, [(_i("a"), _i("b"), _i("c"))]
    )
    fresh.save(path)
    got = GraphStore.load(spark, path)
    assert _quad_terms(got) == [("<a>", "<b>", "<c>", None)]


def test_delta_log_nodes_merge_is_narrow_for_untouched_rows(spark, tmp_path):
    """Plan pin for the 100-TB claim: with a small delta, the base
    nodes table contributes via a FILTER (narrow), and the only
    aggregate runs over the touched sliver + log rows. Concretely: the
    merged nodes plan contains no full-table Exchange ABOVE the base
    parquet scan on the untouched branch."""
    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    GraphStore.save_deltas(
        spark, path, add=[(_i("harry"), _i("follows"), _i("alice"))]
    )
    got = GraphStore.load(spark, path)
    plan = got.nodes._jdf.queryExecution().optimizedPlan().toString()
    # the untouched branch is a NOT-isin filter straight over the scan
    assert "NOT id" in plan.replace("#", " ").replace("(", " ") or (
        "isin" in plan.lower() or "IN (" in plan or "INSET" in plan.upper()
    )
    # its union arm has no Aggregate over the base relation: exactly
    # one Aggregate subtree (the touched-sliver merge)
    assert plan.count("Aggregate") <= 2


def test_delta_log_budget_decline_falls_back_to_full_merge(spark, tmp_path):
    """Past the touched-ids budget, the merge declines to the full
    groupBy(id) path and still returns the right answer."""
    path = str(tmp_path / "store")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    add = [(_i("harry"), _i("follows"), _i("alice"))]
    delete = [(_i("emily"), _i("follows"), _i("fred"))]
    GraphStore.save_deltas(spark, path, add=add, delete=delete)
    old = spark.conf.get("spark.cayley.delta.touchedIdsBudget", None)
    spark.conf.set("spark.cayley.delta.touchedIdsBudget", "1")
    try:
        got = GraphStore.load(spark, path)
        _assert_equivalent(got, st.apply_deltas(add=add, delete=delete))
    finally:
        if old is None:
            spark.conf.unset("spark.cayley.delta.touchedIdsBudget")
        else:
            spark.conf.set("spark.cayley.delta.touchedIdsBudget", old)


def test_delta_then_query_path(spark, tmp_path):
    """End-to-end: save → save_deltas → load → path query sees the
    delta (the flow a daily-ingest user runs)."""
    from cayley_spark import Path

    path = str(tmp_path / "store")
    GraphStore.from_quad_values(spark, SIMPLE_SOCIAL).save(path)
    GraphStore.save_deltas(
        spark,
        path,
        add=[(_i("harry"), _i("follows"), _i("bob"))],
        delete=[(_i("dani"), _i("follows"), _i("bob"))],
    )
    st = GraphStore.load(spark, path)
    got = sorted(Path.start(st, _i("bob")).in_(_i("follows")).all_values())
    assert got == ["<alice>", "<charlie>", "<harry>"]


def test_compact_crash_window_stale_log_ignored(spark, tmp_path):
    """The compaction watermark (_folded_through, riding the quads
    swap) makes the crash-between-swap-and-log-delete window safe:
    a resurrected (already-folded) log must be IGNORED by load()
    instead of re-applied (duplicate adds, tombstones matching folded
    re-adds), and a post-crash save_deltas must take a batch id above
    the watermark and apply normally."""
    import shutil

    path = str(tmp_path / "store")
    GraphStore.from_quad_values(spark, SIMPLE_SOCIAL).save(path)
    GraphStore.save_deltas(
        spark,
        path,
        add=[(_i("harry"), _i("follows"), _i("alice"))],
        delete=[(_i("emily"), _i("follows"), _i("fred"))],
    )
    stale = str(tmp_path / "stale_log")
    shutil.copytree(os.path.join(path, "delta"), stale)
    clean = GraphStore.compact(spark, path)
    want_quads = _quad_terms(clean)
    want_nodes = set(_node_state(clean))
    assert os.path.exists(
        os.path.join(path, "quads", "_folded_through")
    )
    # simulate the crash: the folded log survives the swap
    shutil.copytree(stale, os.path.join(path, "delta"))
    got = GraphStore.load(spark, path)
    assert _quad_terms(got) == want_quads  # no duplicate harry-add
    assert set(_node_state(got)) == want_nodes  # emily still orphaned
    # a new delta on top of the stale log numbers PAST the watermark
    b = GraphStore.save_deltas(
        spark, path, add=[(_i("harry"), _i("follows"), _i("bob"))]
    )
    assert b == 2
    after_terms = _quad_terms(GraphStore.load(spark, path))
    assert (
        after_terms.count(("<harry>", "<follows>", "<bob>", None)) == 1
    )
    # and a second compact folds ONLY the live batch, idempotently
    final = GraphStore.compact(spark, path)
    assert _quad_terms(final) == after_terms


def test_save_overwrite_crash_window_and_self_overwrite(spark, tmp_path):
    """Overwrite-save onto an existing store routes through the same
    *.save.tmp + rename swap as compact(), with the stale-log
    watermark INSIDE the quads tmp dir — so the watermark lands
    atomically with the new base and there is no window where the new
    base coexists with a live (replayable) old log. Pinned claims:

    1. no *.save.tmp dirs survive a successful save;
    2. a RESURRECTED old log (the crash-between-swap-and-log-delete
       window) is ignored by load() — the new base never re-applies
       deltas that belong to the store it replaced;
    3. the next save_deltas numbers past the watermark;
    4. saving a store BACK ONTO the path its DataFrames lazily read
       from works (the tmp indirection is what makes the
       read-while-overwrite safe).
    """
    import shutil

    path = str(tmp_path / "store")
    GraphStore.from_quad_values(spark, SIMPLE_SOCIAL).save(path)
    GraphStore.save_deltas(
        spark, path, add=[(_i("harry"), _i("follows"), _i("alice"))]
    )
    stale = str(tmp_path / "stale_log")
    shutil.copytree(os.path.join(path, "delta"), stale)

    fresh = GraphStore.from_quad_values(
        spark, [(_i("a"), _i("b"), _i("c"))]
    )
    fresh.save(path)
    assert not os.path.exists(os.path.join(path, "quads.save.tmp"))
    assert not os.path.exists(os.path.join(path, "nodes.save.tmp"))
    assert not os.path.exists(os.path.join(path, "delta"))
    assert os.path.exists(os.path.join(path, "quads", "_folded_through"))

    # crash simulation: the old log survives the swap — must be ignored
    shutil.copytree(stale, os.path.join(path, "delta"))
    got = GraphStore.load(spark, path)
    assert _quad_terms(got) == [("<a>", "<b>", "<c>", None)]

    # next delta numbers past the watermark and applies normally
    b = GraphStore.save_deltas(
        spark, path, add=[(_i("x"), _i("y"), _i("z"))]
    )
    assert b == 2
    assert _quad_terms(GraphStore.load(spark, path)) == [
        ("<a>", "<b>", "<c>", None),
        ("<x>", "<y>", "<z>", None),
    ]

    # self-overwrite: DataFrames lazy over the very files being replaced
    st = GraphStore.load(spark, path)
    st.save(path)
    assert _quad_terms(GraphStore.load(spark, path)) == [
        ("<a>", "<b>", "<c>", None),
        ("<x>", "<y>", "<z>", None),
    ]


def test_load_as_of_time_travel(spark, tmp_path):
    """as_of folds a PREFIX of the log: every historical state is
    reconstructable until compaction folds it away."""
    path = str(tmp_path / "tt")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    base_terms = _quad_terms(GraphStore.load(spark, path))
    b1 = GraphStore.save_deltas(
        spark, path, add=[(_i("harry"), _i("follows"), _i("alice"))]
    )
    b2 = GraphStore.save_deltas(
        spark,
        path,
        add=[(_i("ivy"), _i("follows"), _i("bob"))],
        delete=[(_i("harry"), _i("follows"), _i("alice"))],
    )
    assert (b1, b2) == (1, 2)
    # as_of=0: the base alone
    assert _quad_terms(GraphStore.load(spark, path, as_of=0)) == base_terms
    # as_of=1: harry->alice present, ivy absent
    t1 = _quad_terms(GraphStore.load(spark, path, as_of=b1))
    assert ("<harry>", "<follows>", "<alice>", None) in t1
    assert not any(s == "<ivy>" for s, _, _, _ in t1)
    # as_of=2 == full load: harry->alice deleted again, ivy present
    t2 = _quad_terms(GraphStore.load(spark, path, as_of=b2))
    assert t2 == _quad_terms(GraphStore.load(spark, path))
    assert ("<harry>", "<follows>", "<alice>", None) not in t2
    assert ("<ivy>", "<follows>", "<bob>", None) in t2
    # as_of past the log head = the full state too
    assert _quad_terms(GraphStore.load(spark, path, as_of=99)) == t2


def test_load_as_of_respects_compaction_retention(spark, tmp_path):
    """compact() is the retention boundary: pre-watermark states
    raise loudly; the watermark itself is the compacted base; later
    batches stay reconstructable."""
    path = str(tmp_path / "ttc")
    st = GraphStore.from_quad_values(spark, SIMPLE_SOCIAL)
    st.save(path)
    GraphStore.save_deltas(
        spark, path, add=[(_i("harry"), _i("follows"), _i("alice"))]
    )
    GraphStore.compact(spark, path)  # folds through batch 1
    after_fold = _quad_terms(GraphStore.load(spark, path))
    b2 = GraphStore.save_deltas(
        spark, path, add=[(_i("ivy"), _i("follows"), _i("bob"))]
    )
    with pytest.raises(ValueError, match="no longer reconstructable"):
        GraphStore.load(spark, path, as_of=0)
    # the watermark state = the compacted base exactly
    assert _quad_terms(GraphStore.load(spark, path, as_of=1)) == after_fold
    t2 = _quad_terms(GraphStore.load(spark, path, as_of=b2))
    assert ("<ivy>", "<follows>", "<bob>", None) in t2


def test_cli_dump_as_of(spark, tmp_path):
    """`dump --as-of N` exposes time travel on the CLI."""
    from cayley_spark.__main__ import main

    nq = tmp_path / "in.nq"
    nq.write_text("<alice> <follows> <bob> .\n")
    db = str(tmp_path / "db")
    assert main(["load", "--db", db, "--quads", str(nq)]) == 0
    GraphStore.save_deltas(
        spark, db, add=[(_i("carol"), _i("follows"), _i("dan"))]
    )
    out0 = str(tmp_path / "v0.nq")
    out1 = str(tmp_path / "v1.nq")
    assert main(["dump", "--db", db, "--out", out0, "--as-of", "0"]) == 0
    assert main(["dump", "--db", db, "--out", out1, "--as-of", "1"]) == 0
    v0 = sorted(l for l in open(out0).read().splitlines() if l.strip())
    v1 = sorted(l for l in open(out1).read().splitlines() if l.strip())
    assert v0 == ["<alice> <follows> <bob> ."]
    assert v1 == ["<alice> <follows> <bob> .", "<carol> <follows> <dan> ."]


def test_history_metadata(spark, tmp_path):
    """GraphStore.history reports the reconstructable as_of range."""
    path = str(tmp_path / "hist")
    GraphStore.from_quad_values(spark, SIMPLE_SOCIAL).save(path)
    assert GraphStore.history(spark, path) == {
        "folded_through": 0,
        "latest_batch": 0,
    }
    GraphStore.save_deltas(
        spark, path, add=[(_i("x"), _i("follows"), _i("y"))]
    )
    GraphStore.save_deltas(
        spark, path, add=[(_i("y"), _i("follows"), _i("z"))]
    )
    assert GraphStore.history(spark, path) == {
        "folded_through": 0,
        "latest_batch": 2,
    }
    GraphStore.compact(spark, path)
    assert GraphStore.history(spark, path) == {
        "folded_through": 2,
        "latest_batch": 2,
    }

"""MQL golden corpus over simple_social — mirrors the reference's
/root/reference/query/mql/mql_test.go testQueries. Comparisons are
unordered (the reference compares JSON arrays whose order follows
iteration order); single-struct slots are pinned to the minimum
neighbor term (the reference's choice is iteration-order-dependent,
documented in query/mql.py)."""

import pytest

from cayley_spark.query.mql import MQLSession


@pytest.fixture(scope="module")
def mql(social):
    return MQLSession(social)


def unordered(rows):
    import json

    return sorted(json.dumps(r, sort_keys=True) for r in rows)


def check(mql, query, expect):
    assert unordered(mql.execute(query)) == unordered(expect)


def test_all_ids(mql):
    out = mql.execute('[{"id": null}]')
    ids = {r["id"] for r in out}
    assert "<alice>" in ids and '"cool_person"' in ids
    assert len(out) == 14  # every distinct node in testdata.nq


def test_nodes_by_status(mql):
    check(
        mql,
        '[{"id": null, "<status>": "cool_person"}]',
        [
            {"id": "<bob>", "<status>": "cool_person"},
            {"id": "<dani>", "<status>": "cool_person"},
            {"id": "<greg>", "<status>": "cool_person"},
        ],
    )


def test_null_semantics(mql):
    # "status" without <> is a plain-string predicate that doesn't
    # exist as an edge — output slot stays null, row not filtered
    check(
        mql,
        '[{"id": "cool_person", "status": null}]',
        [{"id": '"cool_person"', "status": None}],
    )


def test_follows_list(mql):
    check(
        mql,
        '[{"id": "<charlie>", "<follows>": []}]',
        [{"id": "<charlie>", "<follows>": ["<bob>", "<dani>"]}],
    )


def test_reverse_follows_list(mql):
    check(
        mql,
        '[{"id": "<fred>", "!<follows>": []}]',
        [{"id": "<fred>", "!<follows>": ["<bob>", "<emily>"]}],
    )


def test_follows_struct(mql):
    # single-struct slot: min-term tie-break (reference is
    # iteration-order dependent; charlie/dani follow two cool people)
    check(
        mql,
        '[{"id": null, "<follows>": {"id": null, "<status>": "cool_person"}}]',
        [
            {"id": "<alice>", "<follows>": {"id": "<bob>", "<status>": "cool_person"}},
            {"id": "<charlie>", "<follows>": {"id": "<bob>", "<status>": "cool_person"}},
            {"id": "<dani>", "<follows>": {"id": "<bob>", "<status>": "cool_person"}},
            {"id": "<fred>", "<follows>": {"id": "<greg>", "<status>": "cool_person"}},
        ],
    )


def test_reverse_follows_struct_list(mql):
    check(
        mql,
        '[{"id": null, "!<follows>": [{"id": null, "<status>": "cool_person"}]}]',
        [
            {"id": "<fred>", "!<follows>": [{"id": "<bob>", "<status>": "cool_person"}]},
            {"id": "<bob>", "!<follows>": [{"id": "<dani>", "<status>": "cool_person"}]},
            {"id": "<greg>", "!<follows>": [{"id": "<dani>", "<status>": "cool_person"}]},
        ],
    )


def test_cofollows_tags(mql):
    check(
        mql,
        '[{"id": null, "@A:<follows>": "<bob>", "@B:<follows>": "<dani>"}]',
        [{"id": "<charlie>", "@A:<follows>": "<bob>", "@B:<follows>": "<dani>"}],
    )


def test_reverse_cofollows(mql):
    check(
        mql,
        '[{"id": null, "!<follows>": {"id": "<charlie>"}, "@A:!<follows>": "<dani>"}]',
        [
            {
                "id": "<bob>",
                "!<follows>": {"id": "<charlie>"},
                "@A:!<follows>": "<dani>",
            }
        ],
    )

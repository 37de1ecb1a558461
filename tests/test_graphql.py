"""GraphQL-flavor golden corpus over simple_social — mirrors the
reference's /root/reference/query/graphql/graphql_test.go casesExecute.
Values render as N-Quads terms (engine convention); object lists are
term-sorted, so expectations are written sorted."""

import pytest

from cayley_spark.query.graphql import GraphQLSession, parse


@pytest.fixture(scope="module")
def gql(social):
    return GraphQLSession(social)


def test_parse_shapes():
    q = parse(
        """{
        me(status: "cool_person", first: 2, offset: 1) {
            id
            followed: follows @rev { id }
            pic @unnest { uri }
            sub {*}
        }
        }"""
    )
    assert len(q) == 1
    f = q[0]
    assert f.alias == "me" and f.limit == 2 and f.skip == 1
    assert f.has == (("status", False, (pytest.approx,)) ,) or f.has[0][0] == "status"
    kids = {c.alias: c for c in f.fields}
    assert kids["followed"].rev and kids["followed"].via == "follows"
    assert kids["pic"].unnest
    assert kids["sub"].fields[0].all_fields


def test_cool_people_and_friends(gql):
    out = gql.execute(
        """{
        me(status: "cool_person") {
            id
            follows { id status }
            followed: follows @rev { id }
        }
        }"""
    )
    me = {o["id"]: o for o in out["me"]}
    assert set(me) == {"<bob>", "<dani>", "<greg>"}
    # bob follows fred, but fred has no status → filtered → null
    assert me["<bob>"]["follows"] is None
    assert [o["id"] for o in me["<bob>"]["followed"]] == [
        "<alice>", "<charlie>", "<dani>",
    ]
    # dani follows bob (1 status → scalar) and greg (2 → list)
    df = {o["id"]: o["status"] for o in me["<dani>"]["follows"]}
    assert df["<bob>"] == '"cool_person"'
    assert df["<greg>"] == ['"cool_person"', '"smart_person"']
    # single followed collapses to an object
    assert me["<dani>"]["followed"]["id"] == "<charlie>"


def test_skip_and_limit(gql):
    out = gql.execute(
        """{
        me(status: "cool_person", first: 1, offset: 1) {
            id
            follows(first: 1) @opt { id }
        }
        }"""
    )
    assert out["me"]["id"] == "<dani>"
    assert out["me"]["follows"]["id"] == "<bob>"


def test_labels(gql):
    out = gql.execute(
        """{
        me {
            id
            status @label(v: <smart_graph>)
        }
        }"""
    )
    me = {o["id"]: o["status"] for o in out["me"]}
    assert me == {"<emily>": '"smart_person"', "<greg>": '"smart_person"'}


def test_expand_all(gql):
    out = gql.execute(
        """{
        me {
            id
            status @label(v: <smart_graph>)
            follows {*}
        }
        }"""
    )
    me = {o["id"]: o for o in out["me"]}
    assert me["<emily>"]["follows"] == {"id": "<fred>", "follows": "<greg>"}
    assert me["<greg>"]["follows"] is None


def test_unnest(gql):
    out = gql.execute(
        """{
        me(id: fred) {
            id
            follows @unnest {
                friend: id
                friend_status: status
                followed: follows(first: 1) @rev @unnest { fof: id }
            }
        }
        }"""
    )
    assert out["me"] == {
        "id": "<fred>",
        "friend": "<greg>",
        "friend_status": ['"cool_person"', '"smart_person"'],
        "fof": "<dani>",
    }


def test_unnest_missing(gql):
    out = gql.execute(
        """{
        me(id: fred) {
            id
            follows_missing @unnest { friend: id }
        }
        }"""
    )
    assert out["me"] == {"id": "<fred>"}


def test_all_optional(gql):
    out = gql.execute("""{ nodes { id, status @opt } }""")
    rows = {o["id"]: o for o in out["nodes"]}
    assert len(rows) == 14
    assert "status" not in rows["<alice>"]
    assert rows["<greg>"]["status"] == ['"cool_person"', '"smart_person"']


def test_unnest_multiple_errors(gql):
    """Unnesting >1 object is an error (reference graphql.go:373-377),
    not a silent per-key merge; (first: 1) forces it."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot unnest more than one"):
        gql.execute(
            """{
            me(id: charlie) {
                id
                follows @unnest { friend: id }
            }
            }"""
        )

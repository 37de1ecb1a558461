"""Acceptance suite: the reference's 11 integration queries over the
30k-movie dataset (471,705 quads), golden outputs included —
/root/reference/graph/graphtest/integration.go:81-442. This is the
de-facto parity gate (SURVEY.md §5.4): multi-hop intersections,
negation, morphism follows, multi-tag saves, all checked as unordered
multisets against the reference's expected JSON.

The graph loads once per test session from the reference's data file
via our n-quads reader and is cached as parquet under /tmp."""

import gzip
import os
import shutil

import pytest

from cayley_spark import GraphStore
from cayley_spark.query.gizmo import graph

SRC_GZ = "/root/reference/data/30kmoviedata.nq.gz"
NQ = "/tmp/30kmoviedata.nq"
STORE = "/tmp/movies_store"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SRC_GZ), reason="movie dataset not available"
)


@pytest.fixture(scope="module", params=["distributed", "local"])
def movies(spark, request):
    """Both engines run the full golden suite: ``local`` mirrors the
    bench configuration (enable_local on the 471k-quad store) so the
    exact code path the baseline numbers measure is parity-gated."""
    if not os.path.exists(os.path.join(STORE, "quads")):
        if not os.path.exists(NQ):
            with gzip.open(SRC_GZ, "rb") as fin, open(NQ + ".tmp", "wb") as fout:
                shutil.copyfileobj(fin, fout)
            os.rename(NQ + ".tmp", NQ)
        from cayley_spark.sources.nquads import read_nquads

        st = read_nquads(spark, NQ)
        st.save(STORE)
    st = GraphStore.load(spark, STORE).persist()
    if request.param == "local":
        st = st.enable_local()
        assert getattr(st, "_local_index", None) is not None
    return st


@pytest.fixture(scope="module")
def g(movies):
    return graph(movies)


def multiset(rows):
    import json

    return sorted(json.dumps(r, sort_keys=True) for r in rows)


def check(got, expect):
    assert multiset(got) == multiset(expect)


STARRING = "</film/film/starring>"
P_ACTOR = "</film/performance/actor>"
P_CHAR = "</film/performance/character>"
NAME = "<name>"


def test_stats(movies):
    st = movies.stats()
    assert st["quads"] == 471705


def test_name_predicate(g):
    check(
        g.V("Humphrey Bogart").In(NAME).All(),
        [{"id": "</en/humphrey_bogart>"}],
    )


def test_two_large_sets_no_intersection(g):
    def get_id(x):
        return g.V(x).In(NAME)

    actor_to_film = g.M().In(P_ACTOR).In(STARRING)
    got = (
        get_id("Oliver Hardy").Follow(actor_to_film).Out(NAME)
        .Intersect(get_id("Mel Blanc").Follow(actor_to_film).Out(NAME))
        .All()
    )
    check(got, [])


def test_three_huge_sets_small_intersection(g):
    def get_id(x):
        return g.V(x).In(NAME)

    actor_to_film = g.M().In(P_ACTOR).In(STARRING)
    a = get_id("Oliver Hardy").Follow(actor_to_film).FollowR(actor_to_film)
    b = get_id("Mel Blanc").Follow(actor_to_film).FollowR(actor_to_film)
    c = get_id("Billy Gilbert").Follow(actor_to_film).FollowR(actor_to_film)

    seen = {}

    def dedup(d):
        if d["id"] not in seen:
            seen[d["id"]] = True
            g.Emit(d)

    a.Intersect(b).Intersect(c).ForEach(dedup)
    check(
        g.emitted(),
        [{"id": "</en/sterling_holloway>"}, {"id": "</en/billy_gilbert>"}],
    )


def test_reference_js_corpus_over_http(movies):
    """The reference's integration corpus queries run VERBATIM as
    lang=gizmo HTTP strings — including the JS-callback behemoth
    (graph/graphtest/integration.go:100-140: named function decls,
    var, object literal, forEach(function(d){...}), `in`, emit)."""
    import json as _json
    import urllib.request

    from cayley_spark.server.http import start_background

    server, _ = start_background(movies)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        def q(body):
            req = urllib.request.Request(
                f"{base}/api/v1/query/gizmo", data=body.encode()
            )
            with urllib.request.urlopen(req) as r:
                return _json.loads(r.read())["result"]

        two_set = """
        function getId(x) { return g.V(x).in("<name>") }
        var actor_to_film = g.M().in("</film/performance/actor>").in("</film/film/starring>")

        getId("Oliver Hardy").follow(actor_to_film).out("<name>").intersect(
            getId("Mel Blanc").follow(actor_to_film).out("<name>")).all()
        """
        assert q(two_set) == []

        behemoth = """
        function getId(x) { return g.V(x).in("<name>") }
        var actor_to_film = g.M().in("</film/performance/actor>").in("</film/film/starring>")

        var a = getId("Oliver Hardy").follow(actor_to_film).followR(actor_to_film)
        var b = getId("Mel Blanc").follow(actor_to_film).followR(actor_to_film)
        var c = getId("Billy Gilbert").follow(actor_to_film).followR(actor_to_film)

        seen = {}

        a.intersect(b).intersect(c).forEach(function (d) {
            if (!(d.id in seen)) {
                seen[d.id] = true;
                g.emit(d)
            }
        })
        """
        check(
            q(behemoth),
            [{"id": "</en/sterling_holloway>"}, {"id": "</en/billy_gilbert>"}],
        )
    finally:
        server.shutdown()


CASABLANCA_PEOPLE = [
    "Ingrid Bergman", "Madeleine LeBeau", "Joy Page", "Claude Rains",
    "S.Z. Sakall", "Helmut Dantine", "Conrad Veidt", "Paul Henreid",
    "Peter Lorre", "Sydney Greenstreet", "Leonid Kinskey", "Lou Marcelle",
    "Dooley Wilson", "John Qualen", "Humphrey Bogart",
]


def test_helpless_checker(g):
    got = (
        g.V().As("person").In(NAME).In().In().Out(NAME).Is("Casablanca").All()
    )
    check(
        got,
        [{"id": "Casablanca", "person": p} for p in CASABLANCA_PEOPLE],
    )


def test_helpless_checker_negated_films(g):
    got = (
        g.V().As("person").In(NAME).In().In().Out(NAME)
        .Except(g.V("Ingrid Bergman").In(NAME).In().In().Out(NAME))
        .Is("Casablanca")
        .All()
    )
    check(got, [])


def test_helpless_checker_negated_actors(g):
    got = (
        g.V().As("person").In(NAME)
        .Except(g.V("Ingrid Bergman").In(NAME))
        .In().In().Out(NAME).Is("Casablanca").All()
    )
    check(
        got,
        [
            {"id": "Casablanca", "person": p}
            for p in CASABLANCA_PEOPLE
            if p != "Ingrid Bergman"
        ],
    )


@pytest.fixture(scope="module")
def common(g):
    """The shared prelude (integration.go:444-460)."""
    movie1 = g.V().Has(NAME, "The Net")
    movie2 = g.V().Has(NAME, "Speed")
    actor1 = g.V().Has(NAME, "Sandra Bullock")
    actor2 = g.V().Has(NAME, "Keanu Reeves")
    film_to_actor = g.M().Out(STARRING).Out(P_ACTOR)
    co_stars1 = (
        g.M().In(P_ACTOR).In(STARRING).Save(NAME, "costar1_movie").Follow(film_to_actor)
    )
    co_stars2 = (
        g.M().In(P_ACTOR).In(STARRING).Save(NAME, "costar2_movie").Follow(film_to_actor)
    )
    m1_actors = movie1.Save(NAME, "movie1").Follow(film_to_actor)
    m2_actors = movie2.Save(NAME, "movie2").Follow(film_to_actor)
    return dict(
        actor1=actor1, actor2=actor2, co_stars1=co_stars1, co_stars2=co_stars2,
        m1_actors=m1_actors, m2_actors=m2_actors,
    )


def test_net_and_speed(g, common):
    got = common["m1_actors"].Intersect(common["m2_actors"]).Out(NAME).All()
    check(
        got,
        [{"id": "Sandra Bullock", "movie1": "The Net", "movie2": "Speed"}],
    )


def test_keanu_in_the_net(g, common):
    got = common["actor2"].Intersect(common["m1_actors"]).Out(NAME).All()
    check(got, [])


def test_keanu_in_speed(g, common):
    got = common["actor2"].Intersect(common["m2_actors"]).Out(NAME).All()
    check(got, [{"id": "Keanu Reeves", "movie2": "Speed"}])


def test_keanu_with_other_in_the_net(g, common):
    got = (
        common["actor2"].Follow(common["co_stars1"])
        .Intersect(common["m1_actors"]).Out(NAME).All()
    )
    check(
        got,
        [
            {"id": "Sandra Bullock", "movie1": "The Net",
             "costar1_movie": "Speed"},
            {"id": "Sandra Bullock", "movie1": "The Net",
             "costar1_movie": "The Lake House"},
        ],
    )


def test_keanu_and_bullock_with_other(g, common):
    got = (
        common["actor1"].Save(NAME, "costar1_actor").Follow(common["co_stars1"])
        .Intersect(
            common["actor2"].Save(NAME, "costar2_actor").Follow(common["co_stars2"])
        )
        .Out(NAME)
        .All()
    )
    # 166 expected rows (integration.go:258-441) — structural checks +
    # spot membership instead of inlining the full table
    assert len(got) == 166
    assert {
        "id": "Steve Martin", "costar1_actor": "Sandra Bullock",
        "costar1_movie": "The Prince of Egypt",
        "costar2_actor": "Keanu Reeves", "costar2_movie": "Parenthood",
    } in got
    assert all(
        set(r) == {"id", "costar1_actor", "costar1_movie",
                   "costar2_actor", "costar2_movie"}
        for r in got
    )


def test_save_predicates_around_nodes(g):
    got = (
        g.V("_:9037", "_:49278", "_:44112", "_:44709", "_:43382")
        .Save(P_CHAR, "char").Save(P_ACTOR, "act").SaveR(STARRING, "film")
        .All()
    )
    check(
        got,
        [
            {"act": "</en/humphrey_bogart>", "char": "Rick Blaine",
             "film": "</en/casablanca_1942>", "id": "_:9037"},
            {"act": "</en/humphrey_bogart>", "char": "Sam Spade",
             "film": "</en/the_maltese_falcon_1941>", "id": "_:49278"},
            {"act": "</en/humphrey_bogart>", "char": "Philip Marlowe",
             "film": "</en/the_big_sleep_1946>", "id": "_:44112"},
            {"act": "</en/humphrey_bogart>", "char": "Captain Queeg",
             "film": "</en/the_caine_mutiny_1954>", "id": "_:44709"},
            {"act": "</en/humphrey_bogart>", "char": "Charlie Allnut",
             "film": "</en/the_african_queen>", "id": "_:43382"},
        ],
    )

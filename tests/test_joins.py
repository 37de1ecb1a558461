"""Temporal join operators (operators/joins.py): as-of and range
join semantics, verified against brute-force references computed in
plain Python over the same rows."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cayley_spark.operators.joins import asof_join, range_join


def _ts(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, m, s, us)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(5), 100.0),
            (2, "A", _ts(10), 101.0),
            (3, "B", _ts(7), 50.0),
            (4, "B", _ts(2), 49.0),  # before any quote
            (5, "C", _ts(9), 10.0),  # key with no quotes at all
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(4), 99.5),
            ("A", _ts(5), 99.9),  # exactly at trade 1's ts
            ("A", _ts(8), 100.5),
            ("B", _ts(6), 48.5),
            ("B", _ts(7, 30), 48.9),
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_exact(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym").orderBy("trade_id")
    rows = {r.trade_id: (r.ts_right, r.bid) for r in out.collect()}
    assert rows[1] == (_ts(5), 99.9)  # exact-ts quote wins
    assert rows[2] == (_ts(8), 100.5)
    assert rows[3] == (_ts(6), 48.5)
    assert rows[4] == (None, None)  # no earlier quote
    assert rows[5] == (None, None)  # unknown key
    assert out.count() == trades.count()
    assert out.columns == trades.columns + ["ts_right", "bid"]


def test_asof_backward_strict(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", allow_exact=False)
    rows = {r.trade_id: r.bid for r in out.collect()}
    assert rows[1] == 99.5  # same-instant quote excluded


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", direction="forward")
    rows = {r.trade_id: (r.ts_right, r.bid) for r in out.collect()}
    assert rows[1] == (_ts(5), 99.9)  # exact match allowed
    assert rows[2] == (None, None)  # nothing later
    assert rows[4] == (_ts(6), 48.5)
    strict = asof_join(
        trades, quotes, on="sym", direction="forward", allow_exact=False
    )
    srows = {r.trade_id: r.bid for r in strict.collect()}
    assert srows[1] == 100.5  # skips the same-instant quote


def test_asof_no_join_node(spark, trades_quotes):
    """The whole operator is union + window: no join operator may
    appear in the physical plan (that's the point vs the naive
    inequality-join formulation)."""
    trades, quotes = trades_quotes
    plan = (
        asof_join(trades, quotes, on="sym")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_range_join_basic(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(0, 30)),
            (2, _ts(1, 0)),  # == start: inclusive
            (3, _ts(2, 0)),  # == end: exclusive
            (4, _ts(1, 59, 999999)),
            (5, _ts(10)),
        ],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(100, _ts(1), _ts(2)), (200, _ts(0), _ts(12))],
        "iid long, start timestamp, end timestamp",
    )
    out = range_join(points, iv, bucket_seconds=60)
    pairs = {(r.pid, r.iid) for r in out.collect()}
    assert pairs == {
        (2, 100),
        (4, 100),
        (1, 200),
        (2, 200),
        (3, 200),
        (4, 200),
        (5, 200),
    }


def test_range_join_keyed_and_oracle(spark):
    """Randomized check vs a brute-force python double loop, with an
    equality key."""
    import random

    rnd = random.Random(7)
    pts = [
        (i, rnd.randrange(3), _ts(rnd.randrange(30), rnd.randrange(60)))
        for i in range(120)
    ]
    ivs = []
    for i in range(40):
        s = _ts(rnd.randrange(28), rnd.randrange(60))
        ivs.append((1000 + i, rnd.randrange(3), s, s + dt.timedelta(seconds=rnd.randrange(1, 240))))
    pdf = spark.createDataFrame(pts, "pid long, k long, ts timestamp")
    idf = spark.createDataFrame(
        ivs, "iid long, k long, start timestamp, end timestamp"
    )
    out = range_join(pdf, idf, bucket_seconds=45, on=["k"])
    got = {(r.pid, r.iid) for r in out.collect()}
    want = {
        (p[0], v[0])
        for p in pts
        for v in ivs
        if p[1] == v[1] and v[2] <= p[2] < v[3]
    }
    assert got == want


def test_range_join_flood_guard(spark):
    points = spark.createDataFrame([(1, _ts(0))], "pid long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), dt.datetime(2025, 1, 1))],
        "iid long, start timestamp, end timestamp",
    )
    with pytest.raises(Exception, match="10000 buckets|assert"):
        range_join(points, iv, bucket_seconds=60).collect()


def test_salted_join_preserves_results(spark):
    """salted inner/left joins must be result-identical to the plain
    join — the salt only changes task placement."""
    from cayley_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(i, i % 4) for i in range(500)] + [(1000 + i, 99) for i in range(50)],
        "row_id long, k long",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(4)], "k long, name string"
    )
    plain = {(r.row_id, r.name) for r in left.join(right, "k").collect()}
    salted = {
        (r.row_id, r.name)
        for r in salted_join(left, right, "k", salt=8).collect()
    }
    assert salted == plain
    lp = {
        (r.row_id, r.name)
        for r in left.join(right, "k", "left").collect()
    }
    ls = {
        (r.row_id, r.name)
        for r in salted_join(left, right, "k", salt=8, how="left").collect()
    }
    assert ls == lp  # unmatched hot key 99 survives with null name


def test_salted_count_matches_groupby(spark):
    from cayley_spark.operators.skew import salted_count

    df = spark.createDataFrame(
        [(i % 3,) for i in range(999)] + [(7,)], "k long"
    )
    plain = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r.k, r.n) for r in salted_count(df, "k").collect()}
    assert salted == plain


def test_asof_randomized_vs_bruteforce(spark):
    """Property check: asof_join against a brute-force python argmax
    over random keyed series, all four direction/exactness modes."""
    import random

    rnd = random.Random(21)
    lrows = [
        (i, rnd.randrange(4), _ts(rnd.randrange(30), rnd.randrange(60)))
        for i in range(150)
    ]
    # unique (key, ts) on the right (the documented determinism
    # precondition)
    seen = set()
    rrows = []
    for i in range(200):
        k, t = rnd.randrange(4), _ts(rnd.randrange(30), rnd.randrange(60))
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rrows.append((k, t, float(i)))
    left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, val double")

    for direction in ("backward", "forward"):
        for exact in (True, False):
            out = asof_join(
                left, right, on="k", direction=direction, allow_exact=exact
            )
            got = {r.lid: r.val for r in out.collect()}
            for lid, k, t in lrows:
                if direction == "backward":
                    cand = [
                        (rt, v) for rk, rt, v in rrows
                        if rk == k and (rt <= t if exact else rt < t)
                    ]
                    want = max(cand)[1] if cand else None
                else:
                    cand = [
                        (rt, v) for rk, rt, v in rrows
                        if rk == k and (rt >= t if exact else rt > t)
                    ]
                    want = min(cand)[1] if cand else None
                assert got[lid] == want, (direction, exact, lid)


def test_asof_match_is_one_row_not_composite(spark):
    """A matched right row's genuine NULL fields must come through as
    NULLs — not be backfilled from an OLDER right row (per-column
    ignorenulls stitching)."""
    left = spark.createDataFrame(
        [(1, "A", _ts(10))], "lid long, sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(1), 10.0, None), ("A", _ts(2), None, 12.0)],
        "sym string, ts timestamp, bid double, ask double",
    )
    r = asof_join(left, right, on="sym").collect()[0]
    assert r.ts_right == _ts(2)
    assert r.bid is None and r.ask == 12.0  # nearest ROW, verbatim


def test_asof_null_timestamps_never_match(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts(5)), (2, "A", None)],
        "lid long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", None, 7.0), ("A", _ts(3), 8.0)],
        "sym string, ts timestamp, bid double",
    )
    rows = {r.lid: r.bid for r in asof_join(left, right, on="sym").collect()}
    assert rows[1] == 8.0  # the NULL-ts right row is not "-infinity"
    assert rows[2] is None  # a NULL-ts left row matches nothing
    fwd = {
        r.lid: r.bid
        for r in asof_join(
            left, right, on="sym", direction="forward"
        ).collect()
    }
    assert fwd[2] is None

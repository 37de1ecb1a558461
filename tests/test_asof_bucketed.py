"""Two-phase (bucketed) asof_join ≡ single-window asof_join.

The bucketed form is the hot-entity scale path (SCALE.md round-13
audit, landed round 14): phase 1 runs the running last/first per
(key, time bucket) so no task holds one key's whole probe+quote
history, each bucket's final right struct carries across buckets
through a window bounded by the key's BUCKET count, and the result is
coalesce(within-bucket, incoming carry). The contract is BIT-IDENTICAL
results for any bucket size, both directions, and both allow_exact
settings — same-timestamp rows share a bucket by construction, so
exactness is decided entirely by phase 1's side ordering.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cayley_spark.operators.joins import asof_join


def _ts(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, m, s, us)


@pytest.fixture(scope="module")
def hot_series(spark):
    """A dense 'hot' key (quote every 2 s, trade every 3 s over an
    hour — many buckets), a key whose trades all precede its quotes,
    and a key with same-instant trade/quote collisions."""
    trades, quotes = [], []
    for t in range(0, 3600, 3):
        trades.append((len(trades), "hot", float(t)))
    for t in range(1, 3600, 2):
        quotes.append(("hot", float(t), float(t) * 0.5))
    trades += [(90_000 + i, "early", float(i)) for i in range(5)]
    quotes += [("early", 100.0 + i, 7.0 + i) for i in range(3)]
    # exact-ts collisions: trade and quote at the same instant
    trades += [(95_000 + i, "tie", float(50 * i)) for i in range(4)]
    quotes += [("tie", float(50 * i), 400.0 + i) for i in range(4)]
    t = spark.createDataFrame(trades, "trade_id long, sym string, ts double")
    q = spark.createDataFrame(quotes, "sym string, ts double, bid double")
    return t, q


def _canon(df):
    return sorted(
        tuple(r[c] for c in df.columns) for r in df.collect()
    )


@pytest.mark.parametrize("bucket", [7.0, 60.0, 100_000.0])
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_bucketed_equals_single_window(spark, hot_series, bucket, direction, exact):
    trades, quotes = hot_series
    base = _canon(
        asof_join(trades, quotes, on="sym", direction=direction,
                  allow_exact=exact)
    )
    two = _canon(
        asof_join(trades, quotes, on="sym", direction=direction,
                  allow_exact=exact, bucket_seconds=bucket)
    )
    assert two == base


@pytest.mark.parametrize("bucket", [45.0, 3600.0])
def test_bucketed_timestamps_and_null_ts(spark, bucket):
    """Timestamp-typed axis + the NULL-timestamp contract through the
    bucketed path: NULL-ts right rows never match, NULL-ts left rows
    match nothing (both directions)."""
    left = spark.createDataFrame(
        [(1, "A", _ts(5)), (2, "A", None), (3, "A", _ts(59))],
        "lid long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", None, 7.0), ("A", _ts(3), 8.0), ("A", _ts(40), 9.0)],
        "sym string, ts timestamp, bid double",
    )
    for direction in ("backward", "forward"):
        base = _canon(asof_join(left, right, on="sym", direction=direction))
        two = _canon(
            asof_join(left, right, on="sym", direction=direction,
                      bucket_seconds=bucket)
        )
        assert two == base
    rows = {
        r.lid: r.bid
        for r in asof_join(
            left, right, on="sym", bucket_seconds=bucket
        ).collect()
    }
    assert rows[1] == 8.0 and rows[2] is None and rows[3] == 9.0


def test_bucketed_match_is_one_row_not_composite(spark):
    """The carried struct is one right ROW: a matched row's genuine
    NULL fields come through as NULLs even when the match arrives via
    the cross-bucket carry."""
    left = spark.createDataFrame(
        [(1, "A", 1000.0)], "lid long, sym string, ts double"
    )
    right = spark.createDataFrame(
        [("A", 1.0, 10.0, None), ("A", 2.0, None, 12.0)],
        "sym string, ts double, bid double, ask double",
    )
    r = asof_join(left, right, on="sym", bucket_seconds=5.0).collect()[0]
    assert r.ts_right == 2.0
    assert r.bid is None and r.ask == 12.0


def test_bucketed_phase1_partitions_by_key_and_bucket(spark, hot_series):
    """The scale claim is structural: every window over the row-level
    union must partition by (key, bucket); the only key-alone window
    is phase 2's, over the per-(key, bucket) carry table."""
    trades, quotes = hot_series
    plan = (
        asof_join(trades, quotes, on="sym", bucket_seconds=60.0)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    # row-level windows order by __ts: every one must ALSO partition
    # by the bucket (never the key alone)
    row_level = [s for s in specs if "__ts" in s]
    assert row_level, plan
    assert all("__bkt" in s and "sym" in s for s in row_level)
    # phase 2 exists: a window over the carry table, ORDERED by the
    # bucket (partitioned by the key alone — bounded by bucket count)
    carry = [s for s in specs if "__ts" not in s and "__bkt" in s]
    assert carry, plan


# ---- randomized equivalence: arbitrary layouts, all four modes

from hypothesis import HealthCheck, given, settings, strategies as st

_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=5000),   # ts (seconds)
    ),
    min_size=1,
    max_size=80,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=_series,
    rrows=_series,
    direction=st.sampled_from(["backward", "forward"]),
    exact=st.booleans(),
    bucket=st.sampled_from([3.0, 97.0, 10_000.0]),
)
def test_asof_bucketed_equivalence_fuzz(
    spark, lrows, rrows, direction, exact, bucket
):
    """Bucketed ≡ brute-force python argmax/argmin (the same model the
    single-window fuzz test pins), for random keyed series including
    duplicate left timestamps and left/right ts collisions."""
    rmap = {}
    for k, t in rrows:  # unique (key, ts): the documented precondition
        rmap[(k, t)] = float(len(rmap))
    rr = [(k, float(t), v) for (k, t), v in rmap.items()]
    left = spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(lrows)],
        "lid long, k long, ts double",
    )
    right = spark.createDataFrame(rr, "k long, ts double, val double")
    out = asof_join(
        left, right, on="k", direction=direction, allow_exact=exact,
        bucket_seconds=bucket,
    )
    got = {r.lid: r.val for r in out.collect()}
    for lid, (k, t) in enumerate(lrows):
        if direction == "backward":
            cand = [
                (rt, v) for rk, rt, v in rr
                if rk == k and (rt <= t if exact else rt < t)
            ]
            want = max(cand)[1] if cand else None
        else:
            cand = [
                (rt, v) for rk, rt, v in rr
                if rk == k and (rt >= t if exact else rt > t)
            ]
            want = min(cand)[1] if cand else None
        assert got[lid] == want, (direction, exact, lid)


def test_bucketed_multi_key(spark):
    """Composite join keys through the bucketed path: every phase
    (bucket window, carry, bucket list, running carry, join-back)
    partitions on ALL keys."""
    import random

    rnd = random.Random(5)
    lrows = [
        (i, rnd.randrange(2), rnd.randrange(3), float(rnd.randrange(500)))
        for i in range(200)
    ]
    seen = set()
    rrows = []
    for i in range(300):
        k = (rnd.randrange(2), rnd.randrange(3), float(rnd.randrange(500)))
        if k in seen:
            continue
        seen.add(k)
        rrows.append((*k, float(i)))
    left = spark.createDataFrame(lrows, "lid long, a long, b long, ts double")
    right = spark.createDataFrame(rrows, "a long, b long, ts double, val double")
    for direction in ("backward", "forward"):
        base = _canon(asof_join(left, right, on=["a", "b"], direction=direction))
        two = _canon(
            asof_join(left, right, on=["a", "b"], direction=direction,
                      bucket_seconds=40.0)
        )
        assert two == base, direction


def test_bucketed_null_keys_match_single_window(spark):
    """Window partitioning groups NULL keys into one group, so the
    single-window form matches NULL-key probes to NULL-key quotes;
    the bucketed form's carry join-back must be NULL-SAFE to agree —
    a plain equi-join would silently drop cross-bucket carries for
    the NULL-key group."""
    left = spark.createDataFrame(
        [(1, None, 100.0), (2, "A", 100.0), (3, None, 5.0)],
        "lid long, sym string, ts double",
    )
    right = spark.createDataFrame(
        [(None, 10.0, 7.0), ("A", 10.0, 8.0)],
        "sym string, ts double, bid double",
    )
    for direction in ("backward", "forward"):
        base = _canon(asof_join(left, right, on="sym", direction=direction))
        # bucket of 20: the ts=100 probes sit many buckets past the
        # ts=10 quotes, so the NULL-key match MUST flow through the
        # cross-bucket carry (backward); forward exercises the
        # no-match side
        two = _canon(
            asof_join(left, right, on="sym", direction=direction,
                      bucket_seconds=20.0)
        )
        assert two == base, direction
    rows = {
        r.lid: r.bid
        for r in asof_join(
            left, right, on="sym", bucket_seconds=20.0
        ).collect()
    }
    assert rows[1] == 7.0 and rows[2] == 8.0 and rows[3] is None

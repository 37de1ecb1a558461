"""Two-phase (bucketed) sessionize ≡ single-phase sessionize.

The bucketed form is the hot-entity scale path (SCALE.md round-13
audit): phase 1 partitions by (key, time bucket) so no task holds one
key's whole history, phase 2 gap-merges the per-bucket sessions. The
contract is BIT-IDENTICAL results for any bucket size — including
buckets smaller than the gap (every session spans many buckets and
the merge chain is long) and buckets larger than the gap (most
sessions never cross a boundary).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cayley_spark.streaming.sessions import sessionize


def _canon(df, ts_str=False):
    def c(v):
        return str(v) if ts_str else v

    return sorted(
        (
            r["user_id"],
            c(r["session_start"]),
            c(r["session_end"]),
            r["n_events"],
        )
        for r in df.collect()
    )


def _synth_numeric(spark):
    """Deterministic spiky traffic: a dense 'bot' key (event every
    2 s for 2000 s — one session spanning many 60 s buckets), a
    bursty key (clusters separated by > gap), and a sparse key."""
    rows = []
    rows += [(1, float(t), t) for t in range(0, 2000, 2)]  # bot
    for burst in (0, 500, 1200, 5000):
        rows += [(2, float(burst + i * 5), 10_000 + burst + i) for i in range(7)]
    rows += [(3, float(t), 20_000 + t) for t in (0, 3000, 3001, 9000)]
    # tie-break exercise: same ts, distinct order ids
    rows += [(4, 100.0, 1), (4, 100.0, 2), (4, 100.0 + 40, 3)]
    return spark.createDataFrame(
        rows, "user_id long, ts double, event_id long"
    )


@pytest.mark.parametrize("bucket", [7.0, 30.0, 60.0, 1000.0])
def test_bucketed_equals_single_phase_numeric(spark, bucket):
    df = _synth_numeric(spark)
    base = _canon(sessionize(df, gap_seconds=30, order_col="event_id"))
    two = _canon(
        sessionize(
            df,
            gap_seconds=30,
            order_col="event_id",
            bucket_seconds=bucket,
        )
    )
    assert two == base
    # sanity: the bot key really collapsed to one session
    assert sum(1 for u, *_ in base if u == 1) == 1


@pytest.mark.parametrize("bucket", [45.0, 3600.0])
def test_bucketed_equals_single_phase_timestamps(spark, bucket):
    df = _synth_numeric(spark).select(
        "user_id",
        F.timestamp_seconds(F.col("ts")).alias("ts"),
        "event_id",
    )
    base = _canon(
        sessionize(df, gap_seconds=30, order_col="event_id"),
        ts_str=True,
    )
    two = _canon(
        sessionize(
            df,
            gap_seconds=30,
            order_col="event_id",
            bucket_seconds=bucket,
        ),
        ts_str=True,
    )
    assert two == base


def test_bucketed_phase1_partitions_by_key_and_bucket(spark):
    """The scale claim is structural: phase 1's window must partition
    by (key, bucket), never by the key alone — assert the plan's
    first window spec carries both partition expressions."""
    df = _synth_numeric(spark)
    plan = sessionize(
        df, gap_seconds=30, bucket_seconds=60.0
    )._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    phase1 = [s for s in specs if "__bkt" in s]
    assert phase1, plan
    assert all("user_id" in s for s in phase1)


@pytest.mark.parametrize("buckets", [2, 7, 64])
def test_stratified_sample_salted_equals_plain(spark, buckets):
    """Two-phase (salted) stratified_sample ≡ the single-window form
    for any bucket count (SCALE.md round-13 audit: a hot stratum's
    top-n no longer sorts the whole stratum in one task — phase 1 is
    B-way parallel per stratum, phase 2 re-ranks ≤ B×n survivors)."""
    from cayley_spark.functions.sampling import stratified_sample

    rows = [(f"s{i % 3}", f"doc-{i}") for i in range(500)]
    rows += [("hot", f"h-{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "stratum string, key string")
    plain = sorted(
        (r["stratum"], r["key"])
        for r in stratified_sample(df, "stratum", 25, "key").collect()
    )
    for b in (buckets,):
        salted = sorted(
            (r["stratum"], r["key"])
            for r in stratified_sample(
                df, "stratum", 25, "key", salt_buckets=b
            ).collect()
        )
        assert salted == plain
    assert sum(1 for s, _ in plain if s == "hot") == 25


# ---- randomized equivalence (hypothesis): the bit-identical claims
# ---- hold for arbitrary event layouts, not just the crafted shapes

from hypothesis import HealthCheck, given, settings, strategies as st

_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),        # user
        st.integers(min_value=0, max_value=5000),     # ts (seconds)
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events_strategy, gap=st.sampled_from([1, 30, 400]),
       bucket=st.sampled_from([7.0, 100.0, 2500.0]))
def test_sessionize_bucketed_equivalence_fuzz(spark, rows, gap, bucket):
    import pandas as pd

    # python reference model: per user, sort, split on gap
    def model():
        out = []
        by_user = {}
        for i, (u, t) in enumerate(rows):
            by_user.setdefault(u, []).append((t, i))
        for u, evs in by_user.items():
            evs.sort()
            start, end, n = None, None, 0
            for t, _ in evs:
                if start is None:
                    start, end, n = t, t, 1
                elif t - end > gap:
                    out.append((u, start, end, n))
                    start, end, n = t, t, 1
                else:
                    end, n = t, n + 1
            out.append((u, start, end, n))
        return sorted(out)

    df = spark.createDataFrame(
        [(u, float(t), i) for i, (u, t) in enumerate(rows)],
        "user_id long, ts double, event_id long",
    )
    want = model()
    for bs in (None, bucket):
        got = sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in sessionize(
                df, gap_seconds=gap, order_col="event_id",
                bucket_seconds=bs,
            ).collect()
        )
        assert got == want, (bs, gap)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.tuples(st.integers(0, 3), st.text("abcdef", min_size=1, max_size=6)),
        min_size=1, max_size=150,
    ),
    n=st.sampled_from([1, 3, 10]),
    buckets=st.sampled_from([2, 9]),
)
def test_stratified_salted_equivalence_fuzz(spark, keys, n, buckets):
    import hashlib

    from cayley_spark.functions.sampling import stratified_sample

    rows = list({(f"s{s}", k) for s, k in keys})  # distinct keys per test
    df = spark.createDataFrame(rows, "stratum string, key string")

    def model():
        by = {}
        for s, k in rows:
            by.setdefault(s, []).append(k)
        out = []
        for s, ks in by.items():
            ks.sort(key=lambda k: (hashlib.md5(k.encode()).hexdigest(), k))
            out += [(s, k) for k in ks[:n]]
        return sorted(out)

    want = model()
    for b in (None, buckets):
        got = sorted(
            (r["stratum"], r["key"])
            for r in stratified_sample(
                df, "stratum", n, "key", salt_buckets=b
            ).collect()
        )
        assert got == want, b

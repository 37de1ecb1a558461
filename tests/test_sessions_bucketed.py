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

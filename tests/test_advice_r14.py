"""Round-14 review-fix regressions (the test_advice_r1x pattern):
the four ADVICE r14 items — out-of-range quantile targets silently
dropping rows, the empty-sketch merge geometry carve-out, history()
claiming metadata cost while scanning the delta log, and the
streaming as-of expiry silently localizing to UTC when the session
timezone is unresolvable."""

from __future__ import annotations

import json
from unittest import mock

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.sketch import (
    sample_sketch_build,
    sample_sketch_merge,
    sample_sketch_quantiles,
)
from cayley_spark.store import GraphStore
from cayley_spark.streaming.asof import asof_join_stream

from .conftest import SIMPLE_SOCIAL, _i


def _sketch(spark, rows, k):
    df = spark.createDataFrame(rows, "key long, val double")
    return sample_sketch_build(df, F.col("key"), F.col("val"), k=k)


def test_quantiles_out_of_range_q_raises(spark):
    """q outside [0,1] used to vanish from the output (ceil(q*n) > n
    matches no rank in the inner join) — now a loud ValueError."""
    sk = _sketch(spark, [(i, float(i)) for i in range(10)], k=8)
    with pytest.raises(ValueError, match=r"q must be in \[0, 1\]"):
        sample_sketch_quantiles(sk, [0.5, 1.5])
    with pytest.raises(ValueError, match=r"q must be in \[0, 1\]"):
        sample_sketch_quantiles(sk, [-0.1])
    # the boundary values stay legal
    got = {r["q"] for r in sample_sketch_quantiles(sk, [0.0, 1.0]).collect()}
    assert got == {0.0, 1.0}


def test_empty_sketch_merge_any_geometry(spark):
    """The documented carve-out: an empty sketch carries no rows, so
    its k is unknowable from the data — it merges with any geometry
    and the result IS the non-empty side (union with nothing)."""
    full = _sketch(spark, [(i, float(i)) for i in range(20)], k=16)
    empty8 = _sketch(spark, [(i, float(i)) for i in range(5)], k=8).limit(0)
    merged = sample_sketch_merge(empty8, full)
    assert [int(r[0]) for r in merged.select("k").distinct().collect()] == [16]
    assert sorted(
        (r["rank"], r["h"], r["v"]) for r in merged.collect()
    ) == sorted((r["rank"], r["h"], r["v"]) for r in full.collect())
    # two empties merge to an empty frame without raising
    assert sample_sketch_merge(empty8, empty8).count() == 0
    # and the non-empty/non-empty mismatch still raises
    k8 = _sketch(spark, [(i, float(i)) for i in range(5)], k=8)
    with pytest.raises(ValueError, match="geometry mismatch"):
        sample_sketch_merge(full, k8)


def test_history_marker_no_data_scan(spark, tmp_path):
    """save_deltas records the latest batch id in a _latest_batch
    marker so history() answers from metadata; exact=True and the
    marker-less / corrupt-marker fallbacks aggregate the log."""
    path = str(tmp_path / "hist")
    GraphStore.from_quad_values(spark, SIMPLE_SOCIAL).save(path)
    GraphStore.save_deltas(
        spark, path, add=[(_i("x"), _i("follows"), _i("y"))]
    )
    GraphStore.save_deltas(
        spark, path, add=[(_i("y"), _i("follows"), _i("z"))]
    )
    marker = tmp_path / "hist" / "delta" / "_latest_batch"
    assert marker.read_text().strip() == "2"
    want = {"folded_through": 0, "latest_batch": 2}
    assert GraphStore.history(spark, path) == want
    assert GraphStore.history(spark, path, exact=True) == want
    # pre-marker stores (or a crash between data and marker): the
    # fallback scans the log and stays correct
    marker.unlink()
    assert GraphStore.history(spark, path) == want
    # a corrupt marker also falls back to the scan, never raises
    marker.write_text("not-a-number")
    assert GraphStore.history(spark, path) == want
    # the next save_deltas heals the marker (numbering seeds from
    # the scan), and compact clears it with the log it describes
    GraphStore.save_deltas(
        spark, path, add=[(_i("z"), _i("follows"), _i("x"))]
    )
    assert marker.read_text().strip() == "3"
    GraphStore.compact(spark, path)
    assert not marker.exists()
    assert GraphStore.history(spark, path) == {
        "folded_through": 3,
        "latest_batch": 3,
    }


def test_asof_stream_unresolvable_timezone_raises(spark, tmp_path):
    """Opt-in expiry needs the session timezone for timeout epoch
    arithmetic; an unresolvable zone used to silently localize to
    UTC on the workers (expiry hours off, no signal) — now a loud
    driver-side ValueError like the missing-watermark check."""
    (tmp_path / "dummy.json").write_text(
        json.dumps({"pid": 1, "sym": "A", "ts": "2024-01-01 00:00:00"})
        + "\n"
    )
    probes = (
        spark.readStream.schema("pid long, sym string, ts timestamp")
        .json(str(tmp_path))
        .withWatermark("ts", "1 second")
    )
    quotes = (
        spark.readStream.schema("sym string, ts timestamp, bid double")
        .json(str(tmp_path))
        .withWatermark("ts", "1 second")
    )
    with mock.patch("zoneinfo.ZoneInfo", side_effect=KeyError("boom")):
        with pytest.raises(ValueError, match="not resolvable"):
            asof_join_stream(
                probes, quotes, on="sym", expire_after_seconds=30.0
            )
    # fixed-offset session zones skip zoneinfo entirely
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "+05:30")
        with mock.patch(
            "zoneinfo.ZoneInfo", side_effect=KeyError("boom")
        ):
            out = asof_join_stream(
                probes, quotes, on="sym", expire_after_seconds=30.0
            )
        assert out is not None
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)

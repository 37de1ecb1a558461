"""Count-Min sketch (functions/sketch.py) vs a pure-python replica:
cell-exact grid, estimate = min over rows, never under true count,
heavy-hitter scan has no false negatives."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.sketch import (
    countmin_build,
    countmin_estimate,
    countmin_heavy_hitters,
)

D, W = 3, 32  # tiny width so collisions (over-counts) actually occur


def _cell(r, key, width=W):
    return int(
        hashlib.md5(f"{r}:{key}".encode()).hexdigest()[:15], 16
    ) % width


def _py_grid(keys, depth=D, width=W):
    g = {}
    for k in keys:
        for r in range(depth):
            c = (r, _cell(r, k, width))
            g[c] = g.get(c, 0) + 1
    return g


WORDS = (
    ["alpha"] * 40 + ["beta"] * 25 + ["gamma"] * 10
    + [f"rare{i}" for i in range(30)]
)


def test_grid_and_estimates_match_replica(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    cms = countmin_build(df, F.col("w"), depth=D, width=W)
    grid = {(r["row"], r["bucket"]): r["cnt"] for r in cms.collect()}
    assert grid == _py_grid(WORDS)
    assert len(grid) <= D * W
    keys = spark.createDataFrame(
        [(k,) for k in set(WORDS) | {"never-seen"}], "w string"
    )
    est = {
        r["w"]: r["est"]
        for r in countmin_estimate(
            keys, cms, F.col("w"), depth=D, width=W
        ).collect()
    }
    g = _py_grid(WORDS)
    true = {k: WORDS.count(k) for k in set(WORDS)}
    for k, e in est.items():
        want = min(
            g.get((r, _cell(r, k)), 0) for r in range(D)
        )
        assert e == want, k
        assert e >= true.get(k, 0)  # CMS never under-counts


def test_heavy_hitters_no_false_negatives(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    hh = {
        r["key"]: r["est"]
        for r in countmin_heavy_hitters(
            df, F.col("w"), threshold=25, depth=D, width=W
        ).collect()
    }
    assert "alpha" in hh and "beta" in hh  # true counts 40, 25
    assert hh["alpha"] >= 40
    for k, e in hh.items():
        assert e >= 25


def test_sketch_validation(spark):
    df = spark.createDataFrame([("x",)], "w string")
    with pytest.raises(ValueError):
        countmin_build(df, F.col("w"), depth=0)
    with pytest.raises(ValueError):
        countmin_build(df, F.col("w"), width=1)

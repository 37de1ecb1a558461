"""Bottom-k sample sketch (functions/sketch.py): python-replica
equality, partitioning independence, the multiset-union merge law,
positional quantiles, and the streaming maintenance fold."""

from __future__ import annotations

import hashlib
import json
import math

from pyspark.sql import functions as F

from cayley_spark.functions.sketch import (
    sample_sketch_build,
    sample_sketch_merge,
    sample_sketch_quantiles,
)


def _model(rows, k):
    """Exact python replica: min value per key, k smallest md5s."""
    best = {}
    for key, v in rows:
        h = hashlib.md5(str(key).encode()).hexdigest()
        best[h] = v if h not in best else min(best[h], v)
    top = sorted(best.items())[:k]
    return [(i + 1, h, float(v), k) for i, (h, v) in enumerate(top)]


def _rows_of(sketch):
    return [
        (r["rank"], r["h"], r["v"], r["k"])
        for r in sketch.orderBy("rank").collect()
    ]


def test_build_matches_replica_and_partitioning_independent(spark):
    rows = [(i % 97, float((i * 13) % 41)) for i in range(500)]
    rows += [(1, -5.0)]  # duplicate key, smaller value -> min rule
    df = spark.createDataFrame(rows, "key long, val double")
    want = _model(rows, 32)
    got = _rows_of(
        sample_sketch_build(df, F.col("key"), F.col("val"), k=32)
    )
    assert got == want
    # partitioning independence: the sample is a pure function of the
    # key set
    got2 = _rows_of(
        sample_sketch_build(
            df.repartition(13), F.col("key"), F.col("val"), k=32
        )
    )
    assert got2 == want


def test_merge_equals_one_pass(spark):
    rows_a = [(i, float(i % 7)) for i in range(60)]
    rows_b = [(i, float(i % 5)) for i in range(40, 120)]  # overlap 40-59
    a = spark.createDataFrame(rows_a, "key long, val double")
    b = spark.createDataFrame(rows_b, "key long, val double")
    sk_a = sample_sketch_build(a, F.col("key"), F.col("val"), k=16)
    sk_b = sample_sketch_build(b, F.col("key"), F.col("val"), k=16)
    merged = _rows_of(sample_sketch_merge(sk_a, sk_b))
    one_pass = _rows_of(
        sample_sketch_build(
            a.unionByName(b), F.col("key"), F.col("val"), k=16
        )
    )
    assert merged == one_pass
    # geometry validation
    sk_c = sample_sketch_build(a, F.col("key"), F.col("val"), k=8)
    import pytest

    with pytest.raises(ValueError, match="geometry mismatch"):
        sample_sketch_merge(sk_a, sk_c)


def test_quantiles_positional_and_exact_below_k(spark):
    # n < k: the sample IS the population, quantiles are exact
    rows = [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(rows, "key long, val double")
    sk = sample_sketch_build(df, F.col("key"), F.col("val"), k=64)
    got = {
        r["q"]: r["value"]
        for r in sample_sketch_quantiles(sk, [0.25, 0.5, 1.0]).collect()
    }
    # sorted values: 1 3 5 7 9; ceil(.25*5)=2 -> 3; ceil(.5*5)=3 -> 5
    assert got == {0.25: 3.0, 0.5: 5.0, 1.0: 9.0}
    # and against the python model at k < n
    rows = [(i, float((i * 31) % 113)) for i in range(400)]
    df = spark.createDataFrame(rows, "key long, val double")
    sk = sample_sketch_build(df, F.col("key"), F.col("val"), k=50)
    model_vals = sorted(v for _, _, v, _ in _model(rows, 50))
    qs = [0.1, 0.5, 0.9]
    want = {q: model_vals[max(1, math.ceil(q * 50)) - 1] for q in qs}
    got = {
        r["q"]: r["value"]
        for r in sample_sketch_quantiles(sk, qs).collect()
    }
    assert got == want


def test_sample_stream_equals_one_pass(spark, tmp_path):
    from cayley_spark.streaming.sketches import _sample_fold, sample_stream

    rows = [(i, float((i * 7) % 23)) for i in range(300)]
    src = tmp_path / "sin"
    src.mkdir()
    for b in range(3):
        with open(src / f"b{b}.json", "w") as f:
            for kk, v in rows[b::3]:
                f.write(json.dumps({"key": kk, "val": v}) + "\n")
    stream = (
        spark.readStream.schema("key long, val double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    path = str(tmp_path / "sk")
    q = (
        sample_stream(stream, F.col("key"), F.col("val"), path, k=24)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["rank"], r["h"], r["v"], r["k"])
        for r in spark.read.parquet(f"{path}/sample").collect()
    )
    df = spark.createDataFrame(rows, "key long, val double")
    want = _rows_of(sample_sketch_build(df, F.col("key"), F.col("val"), k=24))
    assert got == sorted(want)
    # stale-id replay: no-op
    fold = _sample_fold(F.col("key"), F.col("val"), path, 24)
    fold(df.limit(5), 0)
    got2 = sorted(
        (r["rank"], r["h"], r["v"], r["k"])
        for r in spark.read.parquet(f"{path}/sample").collect()
    )
    assert got2 == got
    # k-mismatch refusal
    import pytest

    bad = _sample_fold(F.col("key"), F.col("val"), path, 16)
    with pytest.raises(ValueError, match="carries k="):
        bad(df.limit(5), 99)


def test_null_values_excluded_before_sampling(spark):
    """NULL-valued rows never enter the sample: a key whose only
    value is NULL is absent; a key with mixed NULL/non-NULL values
    keeps its non-NULL minimum (the WHERE-value-IS-NOT-NULL analog —
    keeping NULLs would tie quantile ranks to engine NULL-ordering
    defaults)."""
    rows = [(1, None), (2, 5.0), (2, None), (3, 1.0)]
    df = spark.createDataFrame(rows, "key long, val double")
    sk = sample_sketch_build(df, F.col("key"), F.col("val"), k=16)
    got = {r["h"]: r["v"] for r in sk.collect()}
    h = lambda x: hashlib.md5(str(x).encode()).hexdigest()  # noqa: E731
    assert h(1) not in got
    assert got[h(2)] == 5.0 and got[h(3)] == 1.0

"""Driver-side XXH64 must agree bit-for-bit with Spark's xxhash64 —
this is the contract that makes literal lookups constant-foldable."""

import pyspark.sql.functions as F

from cayley_spark.hashing import hash_str
from cayley_spark.values import (
    java_double_str,
)


def test_matches_spark_xxhash64(spark):
    samples = [
        "",
        "<bob>",
        "I:customer:1",
        "a" * 7,
        "b" * 8,
        "c" * 31,
        "d" * 32,
        "e" * 33,
        "f" * 100,
        "ünïcôdé ♥ 测试",
        "line\nbreak\ttab",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert hash_str(s) == got[s], s


def test_java_double_str_matches_spark_cast(spark):
    vals = [0.0, -0.0, 1.0, -1.5, 5000.5, 0.001, 0.0001, 1e7, 12345678.9,
            1e-4, 3.14159, -2.5e10, 1234567.0, 9999999.5]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i: int, v: double")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", F.col("v").cast("string").alias("s")).collect()
    }
    for i, v in enumerate(vals):
        assert java_double_str(v) == got[i], v

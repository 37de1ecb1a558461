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


def test_nquads_escape_roundtrip_property(spark):
    """Property: for any literal body (incl. adjacent backslashes,
    tabs, quotes, newlines), the DISTRIBUTED ingest path decodes the
    N-Quads escape sequences to the same node id the driver-side
    parser computes — the invariant behind every literal lookup.
    (Regression class: order-sensitive unescaping decoded '\\\\t' as
    backslash+TAB.)"""
    from hypothesis import given, settings, strategies as st

    from cayley_spark.sources.nquads import read_nquads
    from cayley_spark.values import String

    # build one batch of adversarial strings, then ONE spark roundtrip
    # (per-example spark jobs would be minutes, not seconds)
    bodies = [
        "a\\tb", "\\\\t", "\\\\\\t", 'x"y', "x\\\\", "\\n", "a\tb\nc",
        "\\\\n", '\\"', "\\\\\\\\", "plain", "", "trail\\", "\\t\\t",
    ]

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet='ab\\t"\n\r ', max_size=8))
    def gen(s):
        bodies.append(s)

    gen()
    values = sorted({String(b) for b in bodies}, key=lambda v: v.s)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".nq", delete=False) as f:
        for i, v in enumerate(values):
            f.write(f"<s{i}> <p> {v.term()} .\n")
        path = f.name
    st_ = read_nquads(spark, path)
    got = {
        r["id"] for r in st_.nodes.where("kind = 'string'").select("id").collect()
    }
    want = {v.id for v in values}
    missing = want - got
    assert not missing, f"{len(missing)} driver/JVM id mismatches"

"""Focused tests for cayley_spark._sizing (r16: bytes-aware pin
sizing for the iterative algorithms' persisted loop frames —
VERDICT r15 #4)."""

from pyspark.sql import Row

from cayley_spark._sizing import UNKNOWN_SIZE, pin_partitions, plan_size_bytes


def test_plan_size_bytes_real_estimate(spark):
    df = spark.range(1000)
    est = plan_size_bytes(df)
    assert est is not None and 0 < est < UNKNOWN_SIZE


def test_plan_size_bytes_unknown_sentinel(spark):
    # a local-collection leaf (LogicalRDD) has no stats estimate —
    # its sizeInBytes is the Long.MaxValue-family sentinel
    df = spark.createDataFrame([Row(a=1), Row(a=2)])
    rdd_df = spark.createDataFrame(df.rdd, df.schema)
    assert plan_size_bytes(rdd_df) is None


def test_pin_partitions_small_frame_gets_few_partitions(spark):
    # a tiny frame pins at ~1 partition per MB, NOT at
    # defaultParallelism or spark.sql.shuffle.partitions — the r15
    # over-partitioning bug (loop frames launched full-width task
    # waves over a few MB)
    df = spark.range(100)
    est = plan_size_bytes(df)
    assert est is not None and est < (1 << 20)
    assert pin_partitions(df) == 1


def test_pin_partitions_medium_frame_fans_out_to_cores(spark):
    # a frame of >= cores x min_task_bytes still uses every core:
    # with a 1-byte min-task floor the tiny frame's floor saturates
    # at defaultParallelism
    par = spark.sparkContext.defaultParallelism
    got = pin_partitions(spark.range(100), min_task_bytes=1)
    assert got == par


def test_pin_partitions_scales_with_bytes(spark):
    # with a 1-byte target every estimated byte demands a partition,
    # so the count must hit the shuffle.partitions ceiling — the
    # bytes term drives the result between the clamps
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    par = spark.sparkContext.defaultParallelism
    assert pin_partitions(spark.range(10_000), target_bytes=1) == max(
        par, cap
    )


def test_pin_partitions_unknown_falls_back_to_ceiling(spark):
    # unknown estimate -> never under-partition: use the ceiling
    df = spark.createDataFrame([Row(a=1)])
    rdd_df = spark.createDataFrame(df.rdd, df.schema)
    par = spark.sparkContext.defaultParallelism
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert pin_partitions(rdd_df) == max(par, cap)


def test_pin_partitions_non_integer_shuffle_conf(spark, monkeypatch):
    # platform-managed AQE can report shuffle.partitions as "auto"
    # (ADVICE r15: int("auto") raised where a bare persist worked).
    # Local Spark 4 validates the conf at set time, so stub the read.
    df = spark.range(100)
    real_get = spark.conf.get

    def fake_get(key, default=None):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(key, default)

    monkeypatch.setattr(spark.conf, "get", fake_get)
    # must not raise; the tiny frame's bytes floor gives 1, and the
    # unknown-estimate path must degrade to defaultParallelism (the
    # cap fallback), not crash
    assert pin_partitions(df) == 1
    unknown = spark.createDataFrame(
        spark.createDataFrame([(1,)], "a int").rdd,
        "a int",
    )
    par = spark.sparkContext.defaultParallelism
    assert pin_partitions(unknown) == par

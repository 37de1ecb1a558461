"""Hash-sharded Parquet layout: deterministic key→shard placement
with partition-pruned point reads.

At 100 TB, two tables that will be joined on a key should be laid
out so the join needs no shuffle, and a point lookup should read one
shard's files, not the table. Spark's native ``bucketBy`` achieves
this but requires a metastore table; this module provides the
metastore-free equivalent: a ``__shard = pmod(xxhash64(key), n)``
column written ``partitionBy("__shard")`` — one directory per
shard, readable by ANY parquet reader, with shard pruning driven by
an ordinary literal predicate (``PartitionFilters`` in the scan).

The shard function is xxhash64, the engine's own hash — stable
across Spark versions by spec — so two tables sharded with the same
(key expression, n) are co-partitioned by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def shard_of(key, n: int):
    """The shard id column for ``key`` (a Column or column name)."""
    key = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(key), F.lit(n)).cast("int")


def write_sharded(
    df: DataFrame, path: str, key: str, n_shards: int = 64
) -> None:
    """Write ``df`` hash-sharded on ``key`` into ``n_shards``
    directories (``__shard=K/``)."""
    df.withColumn("__shard", shard_of(key, n_shards)).write.mode(
        "overwrite"
    ).partitionBy("__shard").parquet(path)


def read_sharded(spark: SparkSession, path: str) -> DataFrame:
    """Read a sharded table (the ``__shard`` column is dropped —
    it is derivable from the key)."""
    return spark.read.parquet(path).drop("__shard")


def read_shard_for(
    spark: SparkSession, path: str, key: str, value, n_shards: int = 64
) -> DataFrame:
    """Point-read: only the shard directory that can contain
    ``key == value`` is opened (partition pruning on the literal
    ``__shard`` predicate), then the exact predicate filters within
    it. At any table size this reads 1/n_shards of the files."""
    df = spark.read.parquet(path)
    # xxhash64 is TYPE-sensitive (hash(int 42) != hash(bigint 42)):
    # the lookup literal must be cast to the key's stored type or the
    # computed shard id silently points at the wrong directory
    key_type = dict(df.dtypes)[key]
    sid = (
        spark.range(1)
        .select(
            shard_of(F.lit(value).cast(key_type), n_shards).alias("s")
        )
        .collect()[0]["s"]
    )
    return (
        df.where(F.col("__shard") == F.lit(sid))
        .where(F.col(key) == F.lit(value))
        .drop("__shard")
    )

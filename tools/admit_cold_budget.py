"""Isolated COLD-START budget for the incremental admission operator
(VERDICT r13 #2/#5): p_admit is the flagship daily-batch entry and
the slowest thing in the suite when cold, but "cold is noisy" must
not be able to hide a regression — this script measures the cold
path in a FRESH SparkSession with the indexes already on disk, and
splits out the index-open cost, so SCALE.md can state a budget per
component.

Phases (all noop-sink, same corpus/params as the p_admit bench entry
at $SPARK_GRAFT_SF_DIR, default sf0.1):

- ``index_open``: SubstrDedupIndex.load + LSHDedupIndex.load +
  geometry checks — includes the crash-recovery probes and meta
  reads, the fixed per-session tax every cold admission pays.
- ``admit_cold``: the first end-to-end admit_corpus_batch execution
  of the session (JIT/codegen + first-touch index file reads).
- ``admit_warm``: the second execution in the same session (the
  number the per-round bench's warm pass tracks).

Run ISOLATED (no concurrent Spark sessions — this host shows 2-30x
contention spikes). Usage:
  python tools/admit_cold_budget.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/admit_cold.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("admit-cold-budget")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import hashlib

    from cayley_spark.functions.dedup_index import (
        LSHDedupIndex,
        SubstrDedupIndex,
    )
    from cayley_spark.functions.pipeline import admit_corpus_batch

    # identical setup to __spark_entry__.p_admit (same cache key, so
    # a prior bench/oracle run's indexes are reused from disk — the
    # cold-start premise)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    docs = docs.withColumn(
        "text", F.regexp_replace("text", r"((?:\S+ ){4}\S+) ", "$1.\n\n")
    )
    bench = docs.where(F.col("doc_id") % 25 == 0)
    rest = docs.where(F.col("doc_id") % 25 != 0)
    corpus = rest.where(F.col("doc_id") % 3 == 0)
    batch = rest.where(F.col("doc_id") % 3 != 0)
    src = f"{sf}/documents.parquet"
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}"
        ":admit:sk=10:lk=3:nh=16:b=4".encode()
    ).hexdigest()[:10]
    spath = f"/tmp/cayley_admit_sidx_{fp}"
    lpath = f"/tmp/cayley_admit_lidx_{fp}"
    from cayley_spark.streaming.sketches import _path_exists

    built = False
    if not _path_exists(spark, os.path.join(spath, "meta")):
        SubstrDedupIndex.build(corpus, k=10).save(spath)
        built = True
    if not _path_exists(spark, os.path.join(lpath, "meta")):
        LSHDedupIndex.build(corpus, k=3, num_hashes=16, bands=4).save(lpath)
        built = True

    t0 = time.time()
    sidx = SubstrDedupIndex.load(spark, spath)
    lidx = LSHDedupIndex.load(spark, lpath)
    assert sidx.k == 10 and (lidx.k, lidx.num_hashes, lidx.bands) == (
        3, 16, 4,
    )
    t_open = time.time() - t0

    def run():
        t0 = time.time()
        admit_corpus_batch(
            batch,
            sidx,
            lidx,
            bench,
            gopher_min_words=30,
            substr_min_count=2,
            jaccard_threshold=0.2,
            update_indexes=False,
        ).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 2)

    t_cold = run()
    t_warm = run()
    out = {
        "sf": sf,
        "indexes_built_this_run": built,  # True taints the cold read
        "index_open_sec": round(t_open, 2),
        "admit_cold_sec": t_cold,
        "admit_warm_sec": t_warm,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

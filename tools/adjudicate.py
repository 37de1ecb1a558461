"""Isolated re-run of suspected bench movers — the measurement side
of the ADJUDICATIONS.json discipline (README "Benchmarks"): any
same-code query whose suite timing moved ≥1.3× is re-run ALONE in a
fresh session, 5 reps, min reported. Suite numbers carry
suite-context effects (neighbor persists, ContextCleaner timing,
co-tenant spikes); the isolated min is the number adjudication
compares against the prior round's level.

Usage: python tools/adjudicate.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), ADJ_REPS (default 5).

Prints one JSON line per query ({name: [reps...], "min": m}) and a
SUMMARY line; transcribe into ADJUDICATIONS.json by hand (the ledger
is append-only and never machine-written — see the _contract key).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        raise SystemExit(2)
    reps = int(os.environ.get("ADJ_REPS", "5"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    # mirror bench.py's session EXACTLY (same configs, same warm
    # graph, same noop-write materialization, GC off the timed path)
    # — an adjudication measured under a different session shape
    # would not be comparable to the suite number it adjudicates
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cayley_spark-adjudicate")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_GC_INTERVAL", "30min"),
        )
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from cayley_spark.graphs.tpch import tpch_graph

    # same warm starting state as bench.py: graph persisted + counted
    g = tpch_graph(spark, sf_dir)
    g.quads.count()
    g.nodes.count()

    def persistent_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    base = persistent_ids()

    def sweep():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for k in m.keySet().toArray():
            if int(k) not in base:
                m.get(k).unpersist(False)

    qs = E.queries()
    out: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.time() - t0, 3))
            sweep()
        spark.sparkContext._jvm.System.gc()
        out[name] = min(runs)
        print(json.dumps({name: runs, "min": min(runs)}), flush=True)
    print("SUMMARY", json.dumps(out))


if __name__ == "__main__":
    main()

"""Dump .explain('formatted') for declared queries to plans/<tag>/.

Usage: python tools/dump_plans.py <outdir> <suffix> [names...]
  e.g. python tools/dump_plans.py plans/r15 before p_admit p_pipeline

Plans are captured under the bench's session config (shuffle
partitions = $SPARK_GRAFT_CPUS, AQE on) but on a small master —
plan SHAPE (Exchange count, join strategy, PushedFilters, codegen
spans, Python-eval nodes) is master-independent. Queries whose
builders run driver-side jobs (adaptive pricing aggregates, seed
collects) execute those jobs during capture; that is the cost of
seeing the plan the bench actually runs.
"""

from __future__ import annotations

import io
import os
import sys
import time


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E

    qs = E.queries()
    todo = names or list(qs)
    for name in todo:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok   {name} ({time.time() - t0:.1f}s)")
        except Exception as exc:  # keep going; report at end
            print(f"FAIL {name}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()

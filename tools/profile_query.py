"""Isolated per-query profiler (optimization-round tooling).

Runs one or more registry queries in a bench-identical session (same
config as bench.py, but with the UI enabled so its REST API serves
per-stage metrics), executes each query cold then warm against the
noop sink, and prints a per-stage breakdown of the WARM run: executor
run time, shuffle read/write bytes, task count, and the stage name.

Usage: python tools/profile_query.py <name> [name...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cayley_spark-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.cleaner.periodicGC.interval", "30min")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    from cayley_spark.graphs.tpch import tpch_graph

    g = tpch_graph(spark, sf_dir)
    g.quads.count()
    g.nodes.count()

    app = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl

    def stages() -> dict[int, dict]:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return {s["stageId"]: s for s in json.load(r)}

    def jobs() -> list[dict]:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs"
        ) as r:
            return json.load(r)

    def persistent_ids() -> set[int]:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    def unpersist_new(before: set[int]) -> None:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for k in m.keySet().toArray():
            if int(k) not in before:
                m.get(k).unpersist(False)

    queries = E.queries()
    base_persisted = persistent_ids()
    for name in names:
        fn = queries[name]
        # cold rep
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        cold = time.time() - t0
        unpersist_new(base_persisted)
        jobs_before = {j["jobId"] for j in jobs()}
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        warm = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        unpersist_new(base_persisted)
        new_jobs = [j for j in jobs() if j["jobId"] not in jobs_before]
        stage_ids = sorted(
            {sid for j in new_jobs for sid in j["stageIds"]}
        )
        sm = stages()
        rows = []
        for sid in stage_ids:
            s = sm.get(sid)
            if not s:
                continue
            rows.append(
                (
                    s.get("executorRunTime", 0),
                    sid,
                    s.get("numCompleteTasks", 0),
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    s.get("inputBytes", 0),
                    (s.get("name") or "")[:80],
                )
            )
        rows.sort(reverse=True)
        tot_exec = sum(r[0] for r in rows)
        n_tasks = sum(r[2] for r in rows)
        print(
            f"\n=== {name}: cold {cold:.2f}s warm {warm:.2f}s | "
            f"{len(new_jobs)} jobs {len(rows)} stages {n_tasks} tasks "
            f"execRunTime {tot_exec/1000:.1f}s ==="
        )
        for rt, sid, nt, srd, swr, inp, nm in rows[:14]:
            print(
                f"  stage {sid:5d} exec {rt/1000:6.2f}s tasks {nt:4d} "
                f"in {inp>>20:4d}MB sr {srd>>20:4d}MB sw {swr>>20:4d}MB  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()

"""Diagnose the r14 in-suite tail inflation (VERDICT r15 item 1).

Mirrors bench.py's loop (same session config, same per-query
unpersist + GC cadence) but runs each query ONCE and records, after
every query family: elapsed, JVM CodeCache / Metaspace / heap usage,
GC counts and cumulative time, and loaded-class count. The suspects
(s_kcenter, q12, q_range, q_rollup, q_pivot) inflated 18-20x at
registry positions ~96-101 in BOTH r14 runs while running at r13
levels isolated — hypothesis: accumulated whole-stage-codegen classes
exhaust the default 240 MB ReservedCodeCacheSize, the JIT compiler
shuts off, and everything downstream runs interpreted.

Writes /root/repo/tools/bench_diag_out.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out: dict = {}
    for pool in mf.getMemoryPoolMXBeans().toArray():
        name = pool.getName()
        if any(k in name for k in ("CodeHeap", "Metaspace", "Old Gen", "Eden")):
            u = pool.getUsage()
            out[name] = {
                "used_mb": round(u.getUsed() / 1e6, 1),
                "max_mb": round(u.getMax() / 1e6, 1),
            }
    gc_count = 0
    gc_ms = 0
    for gc in mf.getGarbageCollectorMXBeans().toArray():
        gc_count += gc.getCollectionCount()
        gc_ms += gc.getCollectionTime()
    out["gc"] = {"count": int(gc_count), "ms": int(gc_ms)}
    cl = mf.getClassLoadingMXBean()
    out["classes"] = {
        "loaded": int(cl.getLoadedClassCount()),
        "unloaded": int(cl.getUnloadedClassCount()),
    }
    comp = mf.getCompilationMXBean()
    out["jit_ms"] = int(comp.getTotalCompilationTime())
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cayley_spark-bench-diag")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.cleaner.periodicGC.interval", "30min")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    extra = os.environ.get("SPARK_GRAFT_DIAG_JAVAOPTS", "")
    if extra:
        builder = builder.config("spark.driver.extraJavaOptions", extra)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from cayley_spark.graphs.tpch import tpch_graph

    t0 = time.time()
    g = tpch_graph(spark, sf_dir)
    g.quads.count()
    g.nodes.count()
    load_sec = round(time.time() - t0, 3)

    def _persistent_ids() -> set[int]:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    def _unpersist_new(before: set[int]) -> None:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for k in m.keySet().toArray():
            if int(k) not in before:
                m.get(k).unpersist(False)

    base_persisted = _persistent_ids()
    jvm_gc = spark.sparkContext._jvm.System.gc

    rows = []
    all_queries = E.queries()
    queries = {k: v for k, v in all_queries.items() if k != "g_recursive_dist"}
    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        sec = round(time.time() - t0, 3)
        _unpersist_new(base_persisted)
        st = jvm_stats(spark)
        st["i"] = i
        st["name"] = name
        st["sec"] = sec
        rows.append(st)
        print(
            f"{i:3d} {name:22s} {sec:8.3f}s  "
            f"code={sum(v['used_mb'] for k, v in st.items() if isinstance(v, dict) and 'CodeHeap' in k):7.1f}MB "
            f"meta={st.get('Metaspace', {}).get('used_mb', 0):7.1f}MB "
            f"classes={st['classes']['loaded']:6d} "
            f"gc={st['gc']['ms']:6d}ms jit={st['jit_ms']:6d}ms",
            flush=True,
        )
        if i % 2 == 1:
            jvm_gc()

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_diag_out.json"), "w") as f:
        json.dump({"load_sec": load_sec, "rows": rows}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

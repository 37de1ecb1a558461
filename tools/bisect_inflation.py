"""Bisect the in-suite inflation of s_kcenter/q12/q_rollup/q_range
(VERDICT r14 #1): run a chosen slice of the registry with bench.py's
exact mechanics (persisted tpch graph, warmed workers, min-of-2,
per-query unpersist scoping, GC cadence) while sampling the JVM
CodeCache / metaspace pools after every query, so a cumulative-JIT
mechanism shows up as pool saturation at the inflation onset.

Usage:
  python tools/bisect_inflation.py [--from NAME] [--to NAME]
      [--drop NAME,NAME] [--gc {asis,none,every,settle}]
      [--codecache-mb N] [--sf DIR]

  --from/--to     inclusive registry-order slice (default: full)
  --drop          names to skip inside the slice
  --gc            asis   = bench.py cadence (after odd positions)
                  none   = never call System.gc()
                  every  = after every query + 1s cleaner settle
                  settle = asis + 1s sleep after each GC
  --codecache-mb  relaunch JVM with -XX:ReservedCodeCacheSize=Nm
                  (must be set before the session starts)

Findings land in the ADJUDICATIONS.json ledger, not here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="frm", default=None)
    ap.add_argument("--to", dest="to", default=None)
    ap.add_argument("--drop", default="")
    ap.add_argument("--gc", default="asis",
                    choices=["asis", "none", "every", "settle"])
    ap.add_argument("--codecache-mb", type=int, default=0)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    if args.codecache_mb:
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f'--driver-java-options "-XX:ReservedCodeCacheSize='
            f'{args.codecache_mb}m" pyspark-shell'
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bisect-inflation")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.cleaner.periodicGC.interval", "30min")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as E

    jvm = spark.sparkContext._jvm

    def pools() -> dict[str, float]:
        """MB used of every CodeHeap / Metaspace pool (JMX)."""
        out = {}
        beans = jvm.java.lang.management.ManagementFactory \
            .getMemoryPoolMXBeans()
        for i in range(beans.size()):
            b = beans.get(i)
            name = b.getName()
            if "CodeHeap" in name or "Metaspace" in name:
                u = b.getUsage()
                out[name] = round(u.getUsed() / 1048576, 1)
        return out

    t0 = time.time()
    from cayley_spark.graphs.tpch import tpch_graph

    g = tpch_graph(spark, args.sf)
    g.quads.count()
    g.nodes.count()
    from pyspark.sql import functions as _F

    @_F.pandas_udf("boolean")
    def _warm(s):
        return s.astype(str).str.len() > 0

    spark.range(cpus * 4).repartition(cpus).select(
        _warm(_F.col("id").cast("string"))
    ).write.mode("overwrite").format("noop").save()
    load_sec = round(time.time() - t0, 3)
    print(f"load_sec={load_sec} pools={json.dumps(pools())}", flush=True)

    def _persistent_ids() -> set[int]:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    def _unpersist_new(before: set[int]) -> None:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for k in m.keySet().toArray():
            if int(k) not in before:
                m.get(k).unpersist(False)

    drop = {d for d in args.drop.split(",") if d}
    all_q = {k: v for k, v in E.queries().items()
             if k != "g_recursive_dist"}
    names = list(all_q)
    lo = names.index(args.frm) if args.frm else 0
    hi = names.index(args.to) if args.to else len(names) - 1
    picked = [n for n in names[lo:hi + 1] if n not in drop]

    base_persisted = _persistent_ids()
    jvm_gc = jvm.System.gc
    rows = []
    for i, name in enumerate(picked):
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = all_q[name](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
            _unpersist_new(base_persisted)
        if args.gc in ("asis", "settle") and i % 2 == 1:
            jvm_gc()
            if args.gc == "settle":
                time.sleep(1.0)
        elif args.gc == "every":
            jvm_gc()
            time.sleep(1.0)
        p = pools()
        rows.append({"i": i, "name": name, "warm": min(runs),
                     "cold": runs[0], "pools": p})
        print(f"{i:3d} {name:22s} warm={min(runs):8.3f} "
              f"cold={runs[0]:8.3f} {json.dumps(p)}", flush=True)

    total = round(sum(r["warm"] for r in rows), 3)
    print(json.dumps({"slice_total_warm": total, "n": len(rows),
                      "gc": args.gc,
                      "codecache_mb": args.codecache_mb or "default"}))
    spark.stop()


if __name__ == "__main__":
    main()

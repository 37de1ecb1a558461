"""Local replica of the driver's correctness gate: run each
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the
same sf dir; compare row count, column names, and order-insensitive
value multisets. Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def row_key(row, cols):
    return tuple(canon(row[c]) for c in sorted(cols))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        # legacy-nanos events testdata: set at session build so no
        # query function ever mutates session config (harmless for
        # modern micros/NTZ files - the conf only affects NANOS cols)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            ok = False
            print(f"FAIL {name}: cols spark={scols} duck={ocols}")
        elif len(srows) != len(orows):
            ok = False
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(orows)}")
        else:
            smulti = sorted(row_key(r.asDict(), scols) for r in srows)
            omulti = sorted(
                tuple(
                    canon(v)
                    for _, v in sorted(zip(ocols, row), key=lambda p: p[0])
                )
                for row in orows
            )
            if smulti != omulti:
                ok = False
                diff = [
                    (a, b) for a, b in zip(smulti, omulti) if a != b
                ][:3]
                print(f"FAIL {name}: values differ, e.g. {diff}")
        if ok:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print("----")
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

"""Profile the movie-bench small queries: split plan-build vs execution.

Usage: python tools/profile_movies.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile-movies")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import gzip
import shutil

SRC_GZ = "/root/reference/data/30kmoviedata.nq.gz"
NQ = "/tmp/30kmoviedata.nq"
STORE = "/tmp/movies_store"

from cayley_spark import GraphStore

if not os.path.exists(os.path.join(STORE, "quads")):
    if not os.path.exists(NQ):
        with gzip.open(SRC_GZ, "rb") as fin, open(NQ + ".tmp", "wb") as fout:
            shutil.copyfileobj(fin, fout)
        os.rename(NQ + ".tmp", NQ)
    from cayley_spark.sources.nquads import read_nquads

    read_nquads(spark, NQ).save(STORE)

from cayley_spark.query.gizmo import graph

st = GraphStore.load(spark, STORE).persist()
st.quads.count()
st.nodes.count()
t0 = time.time()
st.enable_local()
print(f"local index build: {time.time()-t0:.2f}s")
g = graph(st)

NAME = "<name>"
STARRING = "</film/film/starring>"
P_ACTOR = "</film/performance/actor>"


def get_id(x):
    return g.V(x).In(NAME)


atf = g.M().In(P_ACTOR).In(STARRING)


def q_2set():
    return (
        get_id("Oliver Hardy").Follow(atf).Out(NAME)
        .Intersect(get_id("Mel Blanc").Follow(atf).Out(NAME))
    )


def q_3set():
    a = get_id("Oliver Hardy").Follow(atf).FollowR(atf)
    b = get_id("Mel Blanc").Follow(atf).FollowR(atf)
    c = get_id("Billy Gilbert").Follow(atf).FollowR(atf)
    return a.Intersect(b).Intersect(c).Unique()


reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
for name, fn in [("2set", q_2set), ("3set", q_3set),
                 ("lookup", lambda: g.V("Humphrey Bogart").In(NAME))]:
    for i in range(reps):
        # fresh compile each rep: clear the per-store memo so we measure cold
        st._compile_cache = {}
        t0 = time.time()
        p = fn()._p
        shape = p.shape()
        t1 = time.time()
        df = p.df()
        t2 = time.time()
        vdf = p.values_df()
        t3 = time.time()
        vdf.write.mode("overwrite").format("noop").save()
        t4 = time.time()
        print(
            f"{name} rep{i}: fold={1e3*(t1-t0):.1f}ms compile={1e3*(t2-t1):.1f}ms "
            f"resolve={1e3*(t3-t2):.1f}ms exec={1e3*(t4-t3):.1f}ms total={t4-t0:.3f}s"
        )

spark.stop()

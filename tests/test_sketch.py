"""Count-Min sketch (functions/sketch.py) vs a pure-python replica:
cell-exact grid, estimate = min over rows, never under true count,
heavy-hitter scan has no false negatives."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cayley_spark.functions.sketch import (
    countmin_build,
    countmin_estimate,
    countmin_heavy_hitters,
)

D, W = 3, 32  # tiny width so collisions (over-counts) actually occur


def _cell(r, key, width=W):
    return int(
        hashlib.md5(f"{r}:{key}".encode()).hexdigest()[:15], 16
    ) % width


def _py_grid(keys, depth=D, width=W):
    g = {}
    for k in keys:
        for r in range(depth):
            c = (r, _cell(r, k, width))
            g[c] = g.get(c, 0) + 1
    return g


WORDS = (
    ["alpha"] * 40 + ["beta"] * 25 + ["gamma"] * 10
    + [f"rare{i}" for i in range(30)]
)


def test_grid_and_estimates_match_replica(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    cms = countmin_build(df, F.col("w"), depth=D, width=W)
    grid = {(r["row"], r["bucket"]): r["cnt"] for r in cms.collect()}
    assert grid == _py_grid(WORDS)
    assert len(grid) <= D * W
    keys = spark.createDataFrame(
        [(k,) for k in set(WORDS) | {"never-seen"}], "w string"
    )
    est = {
        r["w"]: r["est"]
        for r in countmin_estimate(
            keys, cms, F.col("w"), depth=D, width=W
        ).collect()
    }
    g = _py_grid(WORDS)
    true = {k: WORDS.count(k) for k in set(WORDS)}
    for k, e in est.items():
        want = min(
            g.get((r, _cell(r, k)), 0) for r in range(D)
        )
        assert e == want, k
        assert e >= true.get(k, 0)  # CMS never under-counts


def test_heavy_hitters_no_false_negatives(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    hh = {
        r["key"]: r["est"]
        for r in countmin_heavy_hitters(
            df, F.col("w"), threshold=25, depth=D, width=W
        ).collect()
    }
    assert "alpha" in hh and "beta" in hh  # true counts 40, 25
    assert hh["alpha"] >= 40
    for k, e in hh.items():
        assert e >= 25


def test_sketch_validation(spark):
    df = spark.createDataFrame([("x",)], "w string")
    with pytest.raises(ValueError):
        countmin_build(df, F.col("w"), depth=0)
    with pytest.raises(ValueError):
        countmin_build(df, F.col("w"), width=1)


def test_geometry_carried_validated_and_persisted(spark, tmp_path):
    """ADVICE r8: countmin_estimate had NO geometry validation — a
    probe with a different depth/width silently under-counted. The
    grid now carries (depth, width); unset parameters inherit them,
    declared mismatches fail loudly (in-plan raise_error on matched
    cells — zero extra jobs on the declared path), and save/load
    round-trips the geometry."""
    import pytest
    from cayley_spark.functions.sketch import (
        countmin_build,
        countmin_estimate,
        countmin_load,
        countmin_save,
    )

    df = spark.createDataFrame(
        [(w,) for w in ("a b a", "b c", "a")], "text string"
    ).select(F.explode(F.split("text", " ")).alias("tok"))
    cms = countmin_build(df, F.col("tok"), depth=3, width=64)
    assert {"row", "bucket", "cnt", "depth", "width"} == set(cms.columns)

    keys = df.select(F.col("tok").alias("key")).distinct()
    # unset parameters inherit the build geometry
    inherited = {
        r["key"]: r["est"]
        for r in countmin_estimate(keys, cms, F.col("key")).collect()
    }
    assert inherited["a"] >= 3 and inherited["c"] >= 1
    # matching declaration agrees
    declared = {
        r["key"]: r["est"]
        for r in countmin_estimate(
            keys, cms, F.col("key"), depth=3, width=64
        ).collect()
    }
    assert declared == inherited
    # mismatched declaration raises (wrong modulus = silent
    # under-count without the guard) — both parameters, both paths
    with pytest.raises(Exception, match="geometry mismatch"):
        countmin_estimate(
            keys, cms, F.col("key"), depth=3, width=128
        ).collect()
    with pytest.raises(Exception, match="geometry mismatch"):
        countmin_estimate(
            keys, cms, F.col("key"), depth=4, width=64
        ).collect()
    with pytest.raises(ValueError, match="geometry mismatch"):
        countmin_estimate(keys, cms, F.col("key"), width=128).collect()

    # persisted round-trip carries the geometry
    path = str(tmp_path / "cms")
    countmin_save(cms, path)
    grid, depth, width = countmin_load(spark, path)
    assert (depth, width) == (3, 64)
    loaded = {
        r["key"]: r["est"]
        for r in countmin_estimate(keys, grid, F.col("key")).collect()
    }
    assert loaded == inherited


def test_kmv_sketch_replica_merge_estimate(spark):
    """KMV distinct sketch: exact python-replica equality of the k
    minima, the Beyer et al. 2007 union property (merge of shard
    sketches == sketch of the concatenated corpus), exact-mode
    estimates below k, sane estimates above k, and k-mismatch
    refusal."""
    import hashlib

    import pytest

    from cayley_spark.functions.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    keys = [f"key-{i % 40}" for i in range(300)]  # 40 distinct
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    sk = kmv_build(df, F.col("key"), k=8)
    got = [(r["rank"], r["h"]) for r in sk.orderBy("rank").collect()]
    want = sorted({hashlib.md5(k.encode()).hexdigest() for k in keys})[:8]
    assert got == [(i + 1, h) for i, h in enumerate(want)]

    # union property: shard sketches merge to the full-corpus sketch
    a = kmv_build(df.where(F.col("key") < "key-2"), F.col("key"), k=8)
    b = kmv_build(df.where(F.col("key") >= "key-2"), F.col("key"), k=8)
    merged = [
        (r["rank"], r["h"])
        for r in kmv_merge(a, b).orderBy("rank").collect()
    ]
    assert merged == got

    # estimate: exact below k, within 40% above k (k=8 is tiny)
    small = spark.createDataFrame(
        [(f"v{i}",) for i in range(5)], "key string"
    )
    assert kmv_estimate(kmv_build(small, F.col("key"), k=8)) == 5.0
    est = kmv_estimate(sk)
    assert 0.6 * 40 < est < 1.4 * 40

    # geometry: mismatched k refuses to merge
    with pytest.raises(ValueError, match="k="):
        kmv_merge(sk, kmv_build(df, F.col("key"), k=16))


def test_countmin_merge_matches_one_pass_build(spark):
    """Count-Min linearity: yesterday's grid + today's delta grid ==
    one-pass build over the union, cell-for-cell; geometry mismatch
    refuses."""
    import pytest

    from cayley_spark.functions.sketch import countmin_build, countmin_merge

    a = spark.createDataFrame(
        [(w,) for w in "a b a c".split()], "tok string"
    )
    b = spark.createDataFrame(
        [(w,) for w in "b c d d".split()], "tok string"
    )
    ga = countmin_build(a, F.col("tok"), depth=3, width=64)
    gb = countmin_build(b, F.col("tok"), depth=3, width=64)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_merge(ga, gb).collect()
    }
    union = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_build(
            a.unionAll(b), F.col("tok"), depth=3, width=64
        ).collect()
    }
    assert merged == union
    with pytest.raises(ValueError, match="geometry mismatch"):
        countmin_merge(
            ga, countmin_build(b, F.col("tok"), depth=3, width=128)
        )


def test_source_overlap_exact_below_k_and_estimates(spark):
    """source_overlap: exact Jaccard when the pair's combined shingle
    space fits the sketch (completeness), correct extremes (identical
    sources -> 1.0, disjoint -> 0.0), a close estimate above k, and
    the no-corpus-shuffle plan shape."""
    from cayley_spark.functions.dedup import word_shingles
    from cayley_spark.functions.sketch import source_overlap

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            ("s0", base),                       # 6 shingles
            ("s1", base),                       # identical to s0
            ("s2", "one two three four five"),  # disjoint from s0/s1
            ("s3", base + " iota kappa"),       # superset of s0
        ],
        "source string, text string",
    )
    out = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap(docs, sketch_k=64).collect()
    }
    assert out[("s0", "s1")]["jaccard_est"] == 1.0
    assert out[("s0", "s2")]["jaccard_est"] == 0.0
    # exact below k: J(s0, s3) = 6/8 (s3 adds 2 shingles)
    r = out[("s0", "s3")]
    assert (r["n_common"], r["n_union"]) == (6, 8)
    assert r["jaccard_est"] == 6 / 8
    assert len(out) == 6  # all unordered pairs of 4 sources

    # estimate above k: two sources sharing half their shingle space
    rows = []
    for i in range(3000):
        rows.append(("a", f"w{i} x{i} y{i}"))        # shingle w_i x_i y_i
    for i in range(1500, 4500):
        rows.append(("b", f"w{i} x{i} y{i}"))
    big = spark.createDataFrame(rows, "source string, text string")
    est = source_overlap(big, sketch_k=256).collect()[0]
    true_j = 1500 / 4500
    assert abs(est["jaccard_est"] - true_j) < 0.12, est

    # plan shape: the corpus flows into the Arrow kernel with NO
    # exchange before it (the per-source minima ride the scan); the
    # only shuffles are over the bounded partials
    plan = source_overlap(docs)._jdf.queryExecution().executedPlan().toString()
    head = plan[plan.index("MapInPandas"):]
    assert "Exchange" not in head.split("MapInPandas")[1].split("Scan")[0]


def test_source_overlap_matches_exact_jaccard_replay(spark):
    """The operator's sketched verdicts against a direct exact-Jaccard
    computation at sub-k scale: every pair exact."""
    from pyspark.sql import functions as F

    from cayley_spark.functions.dedup import word_shingles
    from cayley_spark.functions.sketch import source_overlap

    docs = spark.createDataFrame(
        [
            ("s0", "the quick brown fox jumps over the lazy dog"),
            ("s0", "pack my box with five dozen liquor jugs"),
            ("s1", "the quick brown fox jumps over the lazy dog"),
            ("s2", "sphinx of black quartz judge my vow"),
            ("s2", "pack my box with five dozen liquor jugs"),
        ],
        "source string, text string",
    )
    exact = {}
    sets = {
        r["source"]: set(r["sh"])
        for r in docs.select(
            "source", F.explode(word_shingles(F.col("text"), 3)).alias("g")
        )
        .groupBy("source")
        .agg(F.collect_set("g").alias("sh"))
        .collect()
    }
    for a in sets:
        for b in sets:
            if a < b:
                exact[(a, b)] = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
    got = {
        (r["src_a"], r["src_b"]): r["jaccard_est"]
        for r in source_overlap(docs, sketch_k=512).collect()
    }
    assert got == exact

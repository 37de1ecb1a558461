"""Streaming IVF-index maintenance (streaming/ann.py): the persisted
index maintained per micro-batch equals the batch-add result, replays
are exactly-once per batch id, and the crash-window semantics of both
if_absent modes are pinned."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cayley_spark.functions.ann_index import IVFIndex
from cayley_spark.streaming.ann import _ivf_fold, ivf_stream


def _vec(seed, dim=8):
    # +1 keeps every vector non-zero (a zero norm would divide-by-zero
    # in cosine); the seed-proportional last component makes every
    # seed's vector UNIQUE (the modular components alone repeat every
    # 17 seeds, which made a streamed vector tie with a base one)
    return [
        (float((seed * (i + 3)) % 17) + 1.0) / 18.0 for i in range(dim - 1)
    ] + [1.0 + seed / 1000.0]


def _base_df(spark):
    rows = [(i, _vec(i)) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _ids(spark, path):
    return sorted(
        r["id"]
        for r in spark.read.parquet(f"{path}/buckets").select("id").collect()
    )


def test_ivf_stream_matches_batch_add(spark, tmp_path):
    path = str(tmp_path / "idx")
    IVFIndex.build(_base_df(spark), n_centroids=4).save(path)

    new_rows = [(100 + i, _vec(100 + i)) for i in range(12)]
    src = tmp_path / "vin"
    src.mkdir()
    # two micro-batches
    for b in range(2):
        with open(src / f"b{b}.json", "w") as f:
            for vid, v in new_rows[b::2]:
                f.write(json.dumps({"vec_id": vid, "embedding": v}) + "\n")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        ivf_stream(stream, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _ids(spark, path) == sorted(
        list(range(40)) + [vid for vid, _ in new_rows]
    )
    # bucket assignments identical to a batch add against the same
    # frozen centroids
    path2 = str(tmp_path / "idx2")
    IVFIndex.build(_base_df(spark), n_centroids=4).save(path2)
    IVFIndex.load(spark, path2).add(
        spark.createDataFrame(
            new_rows, "vec_id long, embedding array<double>"
        ),
        path=path2,
    )
    rows1 = sorted(
        (r["id"], r["c"])
        for r in spark.read.parquet(f"{path}/buckets").collect()
    )
    rows2 = sorted(
        (r["id"], r["c"])
        for r in spark.read.parquet(f"{path2}/buckets").collect()
    )
    assert rows1 == rows2
    # a streamed vector is its own nearest neighbor through the
    # maintained index
    got = IVFIndex.load(spark, path).query(
        {105: _vec(105)}, k=1, nprobe=4, exclude_self=False
    )
    assert got.collect()[0]["neighbor_id"] == 105
    # restarting the drained stream is a no-op (no new files)
    q = (
        ivf_stream(stream, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(_ids(spark, path)) == 52


def test_ivf_fold_replay_semantics(spark, tmp_path):
    path = str(tmp_path / "idxr")
    IVFIndex.build(_base_df(spark), n_centroids=4).save(path)
    batch = spark.createDataFrame(
        [(200, _vec(200)), (201, _vec(201))],
        "vec_id long, embedding array<double>",
    )
    fold = _ivf_fold(path, "vec_id", "embedding", if_absent=False)
    fold(batch, 0)
    assert 200 in _ids(spark, path)
    n = len(_ids(spark, path))
    # committed replay (stale batch id): no-op
    fold(batch, 0)
    assert len(_ids(spark, path)) == n
    # crash-window replay (append landed, marker did not — modeled by
    # a FRESH batch id over the same rows): default mode re-appends —
    # the documented safe-direction duplicate
    fold(batch, 1)
    ids = _ids(spark, path)
    assert len(ids) == n + 2 and ids.count(200) == 2
    # if_absent mode is exactly idempotent over the same window
    fold_ia = _ivf_fold(path, "vec_id", "embedding", if_absent=True)
    fold_ia(batch, 2)
    assert len(_ids(spark, path)) == n + 2  # nothing re-landed
    # ...and still appends genuinely new ids
    fresh = spark.createDataFrame(
        [(300, _vec(300))], "vec_id long, embedding array<double>"
    )
    fold_ia(fresh, 3)
    assert 300 in _ids(spark, path)

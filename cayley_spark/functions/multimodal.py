"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` columns with typed metadata, the
standard layout for 100 TB training-data lakes:

    media(doc_id long, kind string, content binary,
          meta struct<mime: string, width: int, height: int,
                      sample_rate: int, duration_ms: int>)

All heavy per-item work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` transforms — one
Python worker per input partition, zero driver involvement, so the
operators scale with the cluster exactly like a JVM map. Codec
libraries (PIL/librosa/av) are NOT present in this container, so the
decode kernels are STUBBED behind ``try: import``; the deterministic
fake path (seeded by xxhash of the bytes) keeps schemas, batch shapes
and partitioning real and testable. Swap `_decode_image_real` in and
nothing else changes.

The reference has no multimodal surface (it is a quad store); this
module is part of the repo's training-data-pipeline extension scope.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def _fake_u64(data: bytes) -> int:
    """Deterministic 64-bit hash of content bytes (FNV-1a; pure python
    so the fake path has no library dependencies)."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


IMAGE_INFO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)


def decode_image_info(media: DataFrame, id_col: str = "doc_id",
                      content_col: str = "content") -> DataFrame:
    """Per-image (width, height, channels, format). Real path uses PIL;
    fake path derives deterministic dimensions from the content hash
    so the distributed plumbing is exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode: wire PIL.Image.open here"
                )
            hs = pdf[content_col].map(lambda b: _fake_u64(bytes(b or b"")))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": (hs % 1920 + 16).astype("int32"),
                    "height": (hs // 1920 % 1080 + 16).astype("int32"),
                    "channels": (hs % 2 * 2 + 1).astype("int32"),
                    "format": (hs % 3).map({0: "jpeg", 1: "png", 2: "webp"}),
                }
            )

    return media.select(id_col, content_col).mapInPandas(
        run, schema=IMAGE_INFO_SCHEMA
    )


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def image_features(media: DataFrame, dim: int = 64, id_col: str = "doc_id",
                   content_col: str = "content") -> DataFrame:
    """Feature-extraction plumbing: content bytes → float vector.
    Fake path: seeded LCG over the content hash (deterministic, unit
    variance-ish); real path would run an ONNX/torch encoder per Arrow
    batch (the batch shape here is exactly what a GPU encoder wants)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                h = _fake_u64(bytes(b or b""))
                vec = []
                for _ in range(dim):
                    h = (h * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                    vec.append(((h >> 33) % 2000 - 1000) / 1000.0)
                feats.append(vec)
            yield pd.DataFrame({"doc_id": pdf[id_col], "embedding": feats})

    return media.select(id_col, content_col).mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  id_col: str = "doc_id", content_col: str = "content",
                  duration_col: str = "duration_ms") -> DataFrame:
    """Video frame sampling: one output row per sampled frame — a
    flat-map (mapInPandas may emit more rows than it consumes). Fake
    path emits hash-derived 16-byte pseudo-frames at the requested
    cadence; real path would call an av/ffmpeg demuxer per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ts, out_fr = [], [], [], []
            for _, row in pdf.iterrows():
                dur = int(row[duration_col] or 0)
                h = _fake_u64(bytes(row[content_col] or b""))
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    out_id.append(row[id_col])
                    out_idx.append(i)
                    out_ts.append(ts)
                    out_fr.append(
                        (h ^ ts).to_bytes(8, "little") * 2
                    )
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "frame_idx": pd.array(out_idx, dtype="int32"),
                    "ts_ms": pd.array(out_ts, dtype="int32"),
                    "frame": out_fr,
                }
            )

    return media.select(id_col, content_col, duration_col).mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def synthetic_media(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests/demos: binary blobs
    derived from the row id (no RNG, reproducible across runs)."""
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.sha2(F.concat(F.lit(f"media:{seed}:"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("content"),
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(30000)) + 1000)
            .cast("int")
            .alias("duration_ms"),
        ).alias("meta"),
    )
    return df.withColumn("duration_ms", F.col("meta.duration_ms"))

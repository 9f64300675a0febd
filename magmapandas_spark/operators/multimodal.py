"""Multimodal (image/audio/video) column operators — Spark plumbing for
binary payload columns with typed metadata (beyond-reference surface).

Decode/feature-extraction libraries are not available in this
container, so the decode kernels are STUBBED behind
``decoder="fake"`` (deterministic synthetic features) or raise
``NotImplementedError`` for real codecs. The Spark-side contract —
schema, Arrow batch shape, ``mapInPandas`` partitioning — is real and
tested; swapping in a real decoder is a pure kernel change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for exercising the pipeline."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(128 + (i % 64)))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                64 + (i % 32),
                48 + (i % 24),
                1000 + i * 10,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: byte
    histogram folded to ``dim`` buckets, L2-normalised."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    norm = np.linalg.norm(hist)
    return (hist / norm if norm > 0 else hist).astype(np.float32)


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_size_hint: int = 256
) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` — Arrow-batched, one
    narrow stage, no shuffle; the pattern that scales to 100 TB of
    binary payloads (payload bytes never leave the executor)."""
    if decoder != "fake":
        raise NotImplementedError(
            "real image/audio codecs are not available in this "
            "environment; use decoder='fake' (deterministic synthetic "
            "features) — the Spark plumbing is identical"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, schema=_FEATURES_SCHEMA)


# ---- suite entries ----------------------------------------------------
# The synthetic payload is pure arithmetic (byte j of media i is
# (i*7+j) % 256), so DuckDB can regenerate it and the gate compares the
# REAL mapInPandas decode path against an exact oracle. Outputs are
# integer-only (argmax bucket, byte counts, frame timestamps) so no
# float32 rounding enters the hash.

def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(synthetic_media(spark, 64))
    top = F.array_position(
        F.col("feature"), F.array_max("feature")
    ) - F.lit(1)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        top.cast("int").alias("top_bucket"),
    ).orderBy("media_id")


SQL_MEDIA_FEATURES = f"""
WITH m AS (
  SELECT i AS media_id,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
         128 + (i % 64) AS n_bytes
  FROM range(64) t(i)
),
b AS (
  SELECT media_id, kind, n_bytes,
         (media_id * 7 + j.j) % {FEATURE_DIM} AS bucket
  FROM m, LATERAL (SELECT UNNEST(range(n_bytes)) AS j) j
),
h AS (
  SELECT media_id, kind, n_bytes, bucket, COUNT(*) AS c
  FROM b GROUP BY 1, 2, 3, 4
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY media_id ORDER BY c DESC, bucket) AS rn
  FROM h
)
SELECT media_id, kind, n_bytes, CAST(bucket AS INT) AS top_bucket
FROM r WHERE rn = 1
ORDER BY media_id
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_video_frames(synthetic_media(spark, 64), every_ms=1000)
    return frames.select(
        "media_id",
        "frame_ts_ms",
        F.length("payload").cast("long").alias("n_bytes"),
    ).orderBy("media_id", "frame_ts_ms")


SQL_VIDEO_FRAMES = """
WITH m AS (
  SELECT i AS media_id, 1000 + i * 10 AS duration_ms,
         128 + (i % 64) AS n_bytes
  FROM range(64) t(i) WHERE i % 3 = 2
)
SELECT media_id, CAST(f.f AS BIGINT) AS frame_ts_ms, n_bytes
FROM m, LATERAL (SELECT UNNEST(range(0, duration_ms, 1000)) AS f) f
ORDER BY media_id, frame_ts_ms
"""


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real decode unavailable — metadata transformation is
    real (target dims recorded), payload passes through."""
    return media.filter(F.col("kind") == "image").withColumns(
        {
            "target_width": F.lit(width),
            "target_height": F.lit(height),
            "resized": F.lit(False),  # set True by a real decoder kernel
        }
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing: explode frame timestamps from duration
    metadata (real), frame decode stubbed (payload passthrough)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("duration_ms") - 1,
                F.lit(int(every_ms)),
            )
        ).alias("frame_ts_ms"),
        "payload",
    )

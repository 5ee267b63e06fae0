"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
decode kernels are deterministic fakes behind a clearly-marked seam
(``_decode_image_real`` raises ``NotImplementedError``).  Everything Spark-
side — schema, partitioning, Arrow batch shape, ``mapInPandas`` signatures —
is real and tested: swapping in a real decoder is a one-function change.

Scale shape: binary payloads ride in their own column so column pruning
drops them unless a stage needs bytes; feature extraction is ``mapInPandas``
(streaming Arrow batches, bounded memory) rather than ``applyInPandas``
(no grouping needed → no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # binary in real data; see below
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def synth_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes as binary."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    pdf = pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds,
            "payload": [rng.bytes(int(rng.integers(64, 1024))) for _ in range(n)],
            "width": rng.integers(16, 512, n).astype(np.int32),
            "height": rng.integers(16, 512, n).astype(np.int32),
            "duration_ms": rng.integers(0, 60000, n).astype(np.int32),
        }
    )
    df = spark.createDataFrame(pdf)
    return df.withColumn("payload", F.col("payload").cast("binary"))


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decoder seam — wire Pillow/torchvision/ffmpeg here on a cluster
    with the media libs installed."""
    raise NotImplementedError(
        "image/audio decode libs are not present in this environment; "
        "extract_features uses the deterministic fake decoder instead"
    )


def _decode_fake(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake decode: bytes → fixed-dim float feature (byte
    histogram moments).  Stands in for decode→resize→embed."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(arr) == 0:
        return np.zeros(dim)
    chunks = np.array_split(arr, dim)
    return np.array([c.mean() / 255.0 if len(c) else 0.0 for c in chunks])


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` — Arrow-batched, no shuffle.

    Batch shape: each pandas chunk holds whole rows including the binary
    payload; the kernel vectorizes over the batch, one numpy call per row's
    buffer (decode is inherently per-payload)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_fake(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: which timestamps to decode per video.
    Pure relational (sequence + explode) — the expensive decode happens later
    against only these rows."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )

"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata.

The decode/feature kernels are STUBS (image/audio libs are not in this
container): ``decode_image_udf`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it derives features from the
bytes deterministically — the Spark-side plumbing (schemas, mapInPandas
batch shape, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((
            i, kind, f"application/x-fake-{kind}",
            64 + i % 512 if kind == "image" else None,
            64 + (i * 3) % 512 if kind == "image" else None,
            (1000 + i * 37) if kind != "image" else None,
            bytearray(payload),
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: fold the byte histogram
    into a unit vector. Replaces (not approximates) image decode."""
    h = [0] * dim
    for i, b in enumerate(payload):
        h[(b + i) % dim] += 1
    norm = sum(x * x for x in h) ** 0.5 or 1.0
    return [x / norm for x in h]


def extract_features(
    media: DataFrame, dim: int = 32, deterministic_fake: bool = True
) -> DataFrame:
    """Decode/feature-extract via mapInPandas over Arrow batches of binary
    payloads. With ``deterministic_fake=False`` this is where a real
    decoder (PIL/torchaudio/ffmpeg) plugs in; unavailable here → raises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decoding requires image/audio libs not present "
                    "in this environment; pass deterministic_fake=True"
                )
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feature": pdf["payload"].map(lambda p: _fake_feature(bytes(p), dim)),
            })
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (the decode itself is the stub above). Pure Catalyst — explode over a
    sequence bounded by duration."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )

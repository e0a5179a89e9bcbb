"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode/feature steps are Arrow-batched `mapInPandas`
UDFs. The decode kernels themselves are STUBS in this sandbox (no
image/audio libs in the container): `decode_stub=True` produces a
deterministic fake (shape + checksum-seeded pixels) so the Spark-side
plumbing — schema, batch shape, partitioning, UDF signature — is real
and testable; swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        (F.col("id") % 64 + 16).cast("int").alias("width"),
        (F.col("id") % 48 + 16).cast("int").alias("height"),
        (F.col("id") * 37 % 10000).cast("int").alias("duration_ms"),
    )
    return df


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic pixels from the payload checksum.
    Real implementation: PIL.Image.open(io.BytesIO(payload))."""
    if payload is None:
        raise NotImplementedError("real image decode requires PIL — not in sandbox")
    rng = np.random.default_rng(np.frombuffer(payload[:8], dtype=np.uint64))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_image_features(df: DataFrame, bins: int = 8) -> DataFrame:
    """Decode (stub) + per-channel histogram features, Arrow-batched.

    → (media_id, feat: array<float> of 3*bins). The partitioning
    contract: payloads stream through mapInPandas in Arrow batches, so
    executor memory is bounded by batch size, not partition size."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("feat", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _decode_image_stub(payload, int(w), int(h))
                hist = [
                    np.histogram(img[..., c], bins=bins, range=(0, 256))[0]
                    for c in range(3)
                ]
                feats.append(
                    (np.concatenate(hist) / (int(w) * int(h))).astype(np.float32)
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feat": feats})

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(run, out_schema)
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (decode stubbed; the explode/partition shape is real).
    → (media_id, frame_ts_ms)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

The decode step is STUBBED (no image/audio libraries in this container —
``decode_image`` raises NotImplementedError unless a deterministic fake is
requested), but everything Spark-side is real and tested: the MEDIA_SCHEMA
contract, mapInPandas batch iteration, feature-vector schema, and the
partitioning story.

Scale design: payloads are large blobs — the feature extractor runs
``mapInPandas`` so each task streams record batches (bounded memory,
spark.sql.execution.arrow.maxRecordsPerBatch controls batch height);
metadata-only transformations (filtering by width, duration) are column
expressions on the struct and never touch the payload bytes thanks to
parquet column pruning of nested fields.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real decode requires an image library (PIL/cv2) not present in this
    container. The Spark plumbing around it (schema, batching) is tested
    with ``_fake_features``."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not available in this environment; "
        "use extract_features(..., fake=True) for the deterministic test path"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoder+CNN: md5-seeded pseudo-features.
    Stable across runs/engines — good enough to exercise partitioning,
    schema, and downstream similarity ops."""
    h = hashlib.md5(payload or b"").digest()
    return [float(h[i % 16]) / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA rows.

    Batch shape: input record batches with (asset_id, media_type, payload,
    meta); output FEATURE_SCHEMA. With ``fake=False`` this calls
    ``decode_image`` and raises — the documented stub behavior."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(p) if fake else decode_image(p)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, max_width: int = 256, max_height: int = 256
) -> DataFrame:
    """Image resize stage: metadata math is column expressions (target
    dims preserve aspect ratio against the max box); the pixel resample
    itself needs an image library, so the payload transform is the
    documented stub — payload passes through and ``resized`` is False
    whenever actual resampling would have been required. The Spark-side
    contract (pruned metadata read for the planning columns, mapInPandas
    batch shape for the real thing) matches extract_features."""
    w = F.coalesce(F.col("meta.width").cast("double"), F.lit(0.0))
    h = F.coalesce(F.col("meta.height").cast("double"), F.lit(0.0))
    scale = F.least(
        F.lit(1.0),
        F.least(
            F.lit(float(max_width)) / F.greatest(w, F.lit(1.0)),
            F.lit(float(max_height)) / F.greatest(h, F.lit(1.0)),
        ),
    )
    return media.where(F.col("media_type") == "image").select(
        "asset_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.floor(w * scale).cast("int").alias("target_width"),
        F.floor(h * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resample"),
        "payload",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: computes per-asset frame timestamps from
    metadata only (no payload touch → parquet reads prune the blob column).
    The actual frame decode would run in a mapInPandas stage like
    extract_features."""
    return media.where(F.col("media_type") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA table from the documents fixture (payload =
    utf-8 text bytes) so multimodal plumbing is testable on driver testdata."""
    return docs.select(
        F.concat(F.lit("asset-"), F.col("doc_id").cast("string")).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )

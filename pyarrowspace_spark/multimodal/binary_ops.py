"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star LLM-pipeline operator family).

Spark-side plumbing is real and tested: schemas, partition-preserving
mapInPandas decode/feature/resize/frame-sample kernels with correct
Arrow batch shapes. The actual codec work is STUBBED deterministically
(this container ships no image/audio libs): `decode_image_stub`
derives a fake RGB grid from the byte content so the pipeline is
end-to-end testable and reproducible. Swap `_decode_bytes` for a
Pillow/ffmpeg call in production — signatures stay identical.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("payload", BinaryType(), True),      # opaque bytes
])


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic synthetic media table from the documents
    corpus (payload = utf-8 bytes of the text; kind round-robins) —
    gives the multimodal operators a reproducible input at any SF."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
        (F.length("text") * 10).cast("long").alias("duration_ms"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _decode_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic fake 'pixels' from a seeded hash of
    the payload. Replace with a real codec (Pillow/ffmpeg) in
    production — NotImplementedError marks the boundary."""
    if payload is None:
        raise NotImplementedError(
            "real media decode requires a codec library not present in "
            "this environment; payload=None has no stub representation"
        )
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2 ** 31)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3)).astype(np.uint8)


def decode_features(media: DataFrame, n_features: int = 16) -> DataFrame:
    """Decode → per-channel histogram feature vector, Arrow-batched.

    Returns DataFrame[media_id, kind, features array<double>]; the
    mapInPandas kernel preserves partitioning (narrow op) and bounds
    batch memory via the session's Arrow batch size.
    """
    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ])
    nf = int(n_features)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"],
                                     pdf["height"]):
                px = _decode_bytes(payload, w, h)
                hist, _ = np.histogram(px, bins=nf, range=(0, 256))
                total = hist.sum()
                feats.append((hist / total if total else hist).astype(
                    np.float64).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.mapInPandas(kernel, schema=out_schema)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize kernel (nearest-neighbor on the stub pixels): returns
    [media_id, width, height, pixels array<double>] flattened row-major
    — demonstrates the batch shape for pixel-producing UDFs."""
    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixels", ArrayType(DoubleType()), False),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, w, h in zip(pdf["payload"], pdf["width"],
                                     pdf["height"]):
                px = _decode_bytes(payload, w, h)
                yi = (np.arange(out_h) * px.shape[0] // out_h)
                xi = (np.arange(out_w) * px.shape[1] // out_w)
                small = px[yi][:, xi].mean(axis=2)  # grayscale
                out.append(small.ravel().astype(np.float64).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": out_w, "height": out_h, "pixels": out,
            })

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (frame decode itself stubbed via _decode_bytes)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "width", "height",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"),
                       F.lit(int(every_ms)))
        ).alias("frame_ms"),
    )
    return frames.select("media_id", "frame_ms",
                         F.length("payload").alias("payload_bytes"))

"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star LLM-pipeline operator family).

Spark-side plumbing: schemas, partition-preserving mapInPandas
decode/feature/resize/frame-sample kernels with bounded Arrow batch
shapes. Payloads are REAL uncompressed public containers (BMP images,
WAV PCM audio/video tracks — see `codecs.py`), so decode parses actual
headers/geometry/bit-depth and any valid third-party BMP/WAV flows
through the same path; compressed codecs (JPEG/H.264/...) remain
behind the explicit NotImplementedError boundary (no codec libs in
this container — swap `_decode_values` for Pillow/ffmpeg in
production, signatures stay identical).

The synthetic media table derives payload CONTENT from a deterministic
per-doc sample formula (doc_id-seeded linear congruence), which makes
every decoded feature SQL-replayable: the DuckDB oracle regenerates
the same sample stream arithmetically and must land on identical
histograms — the encode→decode round trip is thereby pinned end to
end, not rows-only.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from . import codecs

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("payload", BinaryType(), True),      # opaque bytes
])

MIME = {"image": "image/bmp", "audio": "audio/wav", "video": "audio/wav"}


def _image_dims(doc_id: int) -> tuple[int, int]:
    return int(doc_id % 64 + 16), int(doc_id % 48 + 16)  # (w, h)


def _image_values(doc_id: int) -> np.ndarray:
    """BGR byte stream of the synthetic image: v_i = (31·id + 7i) mod
    256 over row-major pixel order, channel fastest."""
    w, h = _image_dims(doc_id)
    i = np.arange(h * w * 3, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 256).astype(np.uint8)


def _audio_values(doc_id: int, n: int) -> np.ndarray:
    """8-bit PCM samples: v_i = (17·id + 11i) mod 256, n = text chars."""
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 17 + i * 11) % 256).astype(np.uint8)


def _video_track_u16(doc_id: int, n_frames: int) -> np.ndarray:
    """16-bit stereo track as UNSIGNED u16 stream (interleaved L/R):
    u_j = (13·id + 5j) mod 65536 over j in [0, 2·n_frames)."""
    j = np.arange(2 * n_frames, dtype=np.int64)
    return ((doc_id * 13 + j * 5) % 65536).astype(np.int64)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic synthetic media table from the documents
    corpus: kind round-robins on doc_id; payloads are REAL containers
    (BMP / 8-bit mono WAV / 16-bit stereo WAV) whose sample content
    follows the doc_id-seeded formulas above, sized by the doc text —
    a reproducible multimodal input at any SF, decodable by any
    standard BMP/WAV reader."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                n = len(text) if text is not None else 0
                k = doc_id % 3
                w, h = _image_dims(doc_id)
                if k == 0:
                    kind = "image"
                    payload = codecs.encode_bmp(
                        _image_values(doc_id).reshape(h, w, 3))
                elif k == 1:
                    kind = "audio"
                    payload = codecs.encode_wav(
                        _audio_values(doc_id, n), bits=8, channels=1)
                else:
                    kind = "video"
                    track = _video_track_u16(doc_id, n) - 32768
                    payload = codecs.encode_wav(track, bits=16, channels=2)
                out.append((doc_id, kind, MIME[kind], w, h,
                            n * 10, bytearray(payload)))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "mime", "width",
                              "height", "duration_ms", "payload"])

    return docs.select("doc_id", "text").mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_values(payload: bytes) -> np.ndarray:
    """REAL decode to a flat uint8 value stream: BMP → BGR pixel bytes
    (top-down row-major); WAV 8-bit → samples; WAV 16-bit → high byte
    of each (unsigned-shifted) sample. Compressed formats land on the
    explicit NotImplementedError codec boundary."""
    if payload is None:
        raise NotImplementedError(
            "payload=None has no decodable representation")
    data = bytes(payload)
    if data[:2] == b"BM":
        return decoded_bmp_values(data)
    if data[:4] == b"RIFF":
        samples, fmt = codecs.decode_wav(data)
        if fmt["bits"] == 8:
            return samples
        return ((samples.astype(np.int64) + 32768) // 256).astype(np.uint8)
    raise NotImplementedError(
        "compressed/unknown media container: real decode requires a codec "
        "library not present in this environment (BMP and PCM WAV are "
        "supported natively)")


def decoded_bmp_values(data: bytes) -> np.ndarray:
    """Flat BGR byte stream of a decoded BMP (row-major, top-down)."""
    return codecs.decode_bmp(data).ravel()


# Back-compat shim for the round-2..4 test surface.
def _decode_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    if payload is None:
        raise NotImplementedError(
            "payload=None has no decodable representation")
    vals = _decode_values(payload)
    if bytes(payload)[:2] == b"BM":
        return codecs.decode_bmp(bytes(payload))
    # audio/video: fold the value stream into an (h, w, 3)-ish grid for
    # pixel-shaped consumers (resize); featurization uses _decode_values.
    size = height * width * 3
    rep = np.resize(vals if len(vals) else np.zeros(1, np.uint8), size)
    return rep.reshape(height, width, 3)


def decode_features(media: DataFrame, n_features: int = 16) -> DataFrame:
    """Decode → value-histogram feature vector, Arrow-batched.

    Returns DataFrame[media_id, kind, features array<double>]; the
    mapInPandas kernel preserves partitioning (narrow op) and bounds
    batch memory via the session's Arrow batch size. Features are the
    normalized n_features-bin histogram of the decoded uint8 value
    stream (pixel bytes / PCM levels) — bin = v·n_features/256.
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
            for payload in pdf["payload"]:
                vals = _decode_values(payload)
                hist, _ = np.histogram(vals, bins=nf, range=(0, 256))
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
    """Resize kernel (nearest-neighbor over REAL decoded BMP pixels):
    returns [media_id, width, height, pixels array<double>] flattened
    row-major — demonstrates the batch shape for pixel-producing UDFs."""
    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixels", ArrayType(DoubleType()), False),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                px = codecs.decode_bmp(bytes(payload))
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
    timestamp (frame decode itself rides the same codec boundary)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "width", "height",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"),
                       F.lit(int(every_ms)))
        ).alias("frame_ms"),
    )
    return frames.select("media_id", "frame_ms",
                         F.length("payload").alias("payload_bytes"))

"""Multimodal binary-column operators (SURVEY north-star: multimodal
columns as opaque binary + typed metadata; decode/feature/resize/
frame-sample as Arrow-batched kernels over REAL uncompressed public
containers — BMP images, PCM WAV audio/video tracks)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from pyarrowspace_spark.multimodal import binary_ops as M
from pyarrowspace_spark.multimodal import codecs
from pyarrowspace_spark.sources import loaders

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = loaders.load_table(spark, SF_DIR, "documents").filter("doc_id < 60")
    return M.media_table_from_documents(docs).cache()


def test_media_table_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "mime", "width", "height", "duration_ms",
        "payload"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    rows = {r["media_id"]: r for r in media.collect()}
    # payloads are REAL containers with the right magic + exact size
    img = rows[0]          # 0 % 3 == 0 -> image (BMP)
    assert bytes(img["payload"][:2]) == b"BM"
    aud = rows[1]          # audio: 8-bit mono WAV, 44-byte header
    assert bytes(aud["payload"][:4]) == b"RIFF"
    assert len(aud["payload"]) == 44 + aud["duration_ms"] // 10
    vid = rows[2]          # video: 16-bit stereo WAV
    assert bytes(vid["payload"][:4]) == b"RIFF"
    assert len(vid["payload"]) == 44 + 4 * (vid["duration_ms"] // 10)


def test_wav_decode_matches_formula(media):
    """The WAV round trip (encode -> header parse -> PCM read) lands on
    the doc_id-seeded sample formula exactly."""
    row = media.filter(F.col("media_id") == 1).first()
    samples, fmt = codecs.decode_wav(bytes(row["payload"]))
    assert fmt == {"sample_rate": 8000, "bits": 8, "channels": 1}
    n = row["duration_ms"] // 10
    expect = (1 * 17 + np.arange(n) * 11) % 256
    assert np.array_equal(samples, expect.astype(np.uint8))


def test_bmp_decode_matches_formula(media):
    row = media.filter(F.col("media_id") == 3).first()
    px = codecs.decode_bmp(bytes(row["payload"]))
    assert px.shape == (row["height"], row["width"], 3)
    expect = M._image_values(3)
    assert np.array_equal(px.ravel(), expect)


def test_decode_features_histogram(media):
    out = M.decode_features(media, n_features=16)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9
    # deterministic: two runs agree exactly
    again = {r["media_id"]: r["features"] for r in
             M.decode_features(media, n_features=16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]
    # numpy replay of the image histogram
    vals = M._image_values(0)
    hist, _ = np.histogram(vals, bins=16, range=(0, 256))
    got = again[0]
    assert got == pytest.approx((hist / hist.sum()).tolist())


def test_resize_images_shape(media):
    out = M.resize_images(media, out_w=8, out_h=6).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert r["width"] == 8 and r["height"] == 6
        assert len(r["pixels"]) == 48
        assert all(0.0 <= p <= 255.0 for p in r["pixels"])


def test_sample_frames_counts(media):
    every = 500
    out = M.sample_frames(media, every_ms=every)
    got = {r["media_id"]: r["cnt"] for r in
           out.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()}
    vids = media.filter(F.col("kind") == "video").collect()
    assert set(got) == {r["media_id"] for r in vids}
    for r in vids:
        assert got[r["media_id"]] == r["duration_ms"] // every + 1


def test_codec_boundary_raises():
    """Compressed/unknown containers stay behind the explicit
    NotImplementedError codec boundary."""
    with pytest.raises(NotImplementedError):
        M._decode_values(None)
    with pytest.raises(NotImplementedError):
        M._decode_values(b"\xff\xd8\xff\xe0 fake jpeg bytes")


def test_third_party_wav_roundtrip():
    """Any valid uncompressed WAV flows through the same decoder —
    including one with an extra chunk before data."""
    import struct

    s = np.array([0, 128, 255, 64], dtype=np.uint8)
    wav = codecs.encode_wav(s, sample_rate=44100, bits=8, channels=1)
    # splice a LIST chunk between fmt and data
    head, data = wav[:36], wav[36:]
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    spliced = (struct.pack("<4sI4s", b"RIFF",
                           36 + len(extra) + len(data) - 8 + 4, b"WAVE")
               + wav[12:36] + extra + data)
    out, fmt = codecs.decode_wav(spliced)
    assert np.array_equal(out, s)
    assert fmt["sample_rate"] == 44100

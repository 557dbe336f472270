"""Multimodal binary-column operators (SURVEY north-star: multimodal
columns as opaque binary + typed metadata; decode/feature/resize/
frame-sample as Arrow-batched kernels with stubbed codecs)."""

import pyspark.sql.functions as F
import pytest

from pyarrowspace_spark.multimodal import binary_ops as M
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
    # payload round-trips the source text bytes
    row = media.filter(F.col("media_id") == 0).first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["duration_ms"] == len(row["payload"]) * 10  # ascii text


def test_decode_features_histogram(media):
    out = M.decode_features(media, n_features=16)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9
    # deterministic stub: two runs agree exactly
    again = {r["media_id"]: r["features"] for r in
             M.decode_features(media, n_features=16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


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


def test_decode_none_payload_raises():
    with pytest.raises(NotImplementedError):
        M._decode_bytes(None, 4, 4)

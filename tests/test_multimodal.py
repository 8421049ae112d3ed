"""Multimodal plumbing: schemas, mapInPandas batch shapes, deterministic fakes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.multimodal import (
    FRAME_SAMPLE_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    image_features,
    metadata_filter,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=32).cache()


def test_image_features_schema_and_determinism(spark, media):
    out = image_features(media, deterministic_fake=True)
    assert out.schema == IMAGE_FEATURES_SCHEMA
    a = {r["media_id"]: r["content_hash"] for r in out.collect()}
    b = {r["media_id"]: r["content_hash"] for r in image_features(media, deterministic_fake=True).collect()}
    assert a == b  # same blob → same hash, any run/partitioning
    assert len(a) == media.filter(F.col("blob").isNotNull()).count()


def test_image_features_resize_shape(spark, media):
    row = image_features(media, target_w=8, target_h=4, deterministic_fake=True).first()
    assert row["resized_w"] == 8 and row["resized_h"] == 4


def test_real_decode_is_stubbed(spark, media):
    """Without the fake flag the decode must fail loudly, not fabricate."""
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        image_features(media, deterministic_fake=False).collect()


def test_frame_sample_expands_rows(spark, media):
    vids = media.filter(F.col("meta.kind") == "video")
    out = sample_frames(vids, every_nth=10, deterministic_fake=True)
    assert out.schema == FRAME_SAMPLE_SCHEMA
    pdf = out.toPandas()
    n_vids = vids.count()
    assert len(pdf) >= n_vids  # 1:N expansion
    assert (pdf["frame_index"] % 10 == 0).all()
    # frames are content-derived and unique per (media, index)
    assert pdf.groupby("media_id")["frame_blob"].nunique().ge(1).all()


def test_metadata_filter_prunes_without_blob(spark, media):
    filtered = metadata_filter(media, min_w=64, min_h=64)
    assert filtered.count() < media.count()
    # metadata-only projection never carries the blob column
    assert "blob" not in filtered.select("media_id", "meta").columns

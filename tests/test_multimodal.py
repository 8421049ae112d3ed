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


def test_ppm_codec_roundtrip():
    """Real codec: encode → decode is pixel-exact; PPMV demux yields every
    frame as a decodable P6."""
    import numpy as np

    from wikidataquality_spark.operators.multimodal import (
        decode_ppm,
        demux_ppmv,
        encode_ppm,
        encode_ppmv,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    frames = [rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8) for _ in range(5)]
    out = list(demux_ppmv(encode_ppmv(frames)))
    assert [i for i, _ in out] == list(range(5))
    for (_, fb), orig in zip(out, frames):
        assert (decode_ppm(fb) == orig).all()


def test_image_features_real_decode(spark, media):
    """Real path end-to-end: mean_luma equals the numpy-computed luma of the
    stride-resized decoded pixels (no fakes anywhere)."""
    import numpy as np

    from wikidataquality_spark.operators.multimodal import decode_ppm

    imgs = media.filter(F.col("meta.kind") == "image")
    got = {r["media_id"]: r["mean_luma"] for r in image_features(imgs).collect()}
    for row in imgs.select("media_id", "blob").collect():
        px = decode_ppm(bytes(row["blob"]))
        luma = (px.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
        sy, sx = max(luma.shape[0] // 16, 1), max(luma.shape[1] // 16, 1)
        want = float(luma[::sy, ::sx][:16, :16].mean())
        assert got[row["media_id"]] == pytest.approx(want)


def test_frame_sample_real_demux_composes_with_image_features(spark, media):
    """Sampled frames are themselves valid P6 blobs → the image feature
    operator runs unchanged on them (decode pipeline composition)."""
    vids = media.filter(F.col("meta.kind") == "video")
    frames = sample_frames(vids, every_nth=20)
    renamed = frames.select(
        (F.col("media_id") * 1000 + F.col("frame_index")).alias("media_id"),
        F.col("frame_blob").alias("blob"),
    )
    feats = image_features(renamed)
    assert feats.count() == frames.count() > 0
    assert feats.filter(F.col("mean_luma").isNull()).count() == 0


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

"""Multimodal plumbing: schemas, mapInPandas batch shapes, deterministic fakes."""

from __future__ import annotations

import numpy as np
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
    # REAL 1:N expansion: at least one video emits multiple frames (len >=
    # n_vids alone also held for a broken one-frame-per-video sampler)
    sizes = pdf.groupby("media_id").size()
    assert len(sizes) == n_vids and (sizes > 1).any()
    assert (pdf["frame_index"] % 10 == 0).all()
    # frames are content-derived and unique per (media, index): every frame
    # blob within a video differs (nunique >= 1 was true for ANY non-empty
    # group, including a sampler emitting the same blob per frame)
    per_vid = pdf.groupby("media_id")["frame_blob"].agg(
        lambda s: s.map(bytes).nunique()
    )
    assert (per_vid == sizes).all()


def test_metadata_filter_prunes_without_blob(spark, media):
    filtered = metadata_filter(media, min_w=64, min_h=64)
    assert filtered.count() < media.count()
    # the documented contract is PARQUET COLUMN PRUNING: a metadata-only
    # projection's scan must not read blob bytes. Check the physical plan's
    # ReadSchema on an UNCACHED parquet read (the shared `media` fixture is
    # cached, and an InMemoryRelation legitimately holds every column) — the
    # old `'blob' not in select(...).columns` was true by construction of
    # the select and could never fail
    import contextlib
    import io

    # n=16 reads a DIFFERENT parquet file: the CacheManager substitutes the
    # cached InMemoryRelation for any plan that matches the n=32 fixture's
    # read, which would hide the scan we're grading
    uncached = synthetic_media(spark, n=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        metadata_filter(uncached, min_w=64, min_h=64).select(
            "media_id", "meta"
        ).explain("formatted")
    plan = buf.getvalue()
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schemas and all("blob" not in ln for ln in read_schemas)


def test_wav_codec_roundtrip():
    """Real audio codec: encode → decode is sample-exact, rate preserved."""
    import numpy as np

    from wikidataquality_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    samples = rng.integers(-(2**15), 2**15, size=777).astype(np.int16)
    back, sr = decode_wav(encode_wav(samples, 16000))
    assert sr == 16000
    assert (back == samples).all()


def test_audio_features_hand_computed(spark):
    """First-principles anchors: square wave ±A has rms exactly A; a
    full-scale constant clip has clip_ratio 1.0 (the ref_media contract the
    driver oracle pins as SQL literals)."""
    from wikidataquality_spark.operators.multimodal import audio_features, ref_media

    feats = {
        r["media_id"]: r
        for r in audio_features(
            ref_media(spark).filter(F.col("meta.kind") == "audio")
        ).collect()
    }
    a = feats[-101]
    assert a["rms"] == 16384.0 and a["clip_ratio"] == 0.0
    assert a["duration_ms"] == 125 and a["n_bytes"] == 2044
    b = feats[-102]
    assert b["rms"] == 32767.0 and b["clip_ratio"] == 1.0
    assert b["duration_ms"] == 50 and b["n_bytes"] == 1644


def test_audio_features_synthetic(spark, media):
    """Synthetic WAV blobs decode through the real codec; features match a
    local numpy recomputation per clip."""
    import numpy as np

    from wikidataquality_spark.operators.multimodal import audio_features, decode_wav

    auds = media.filter(F.col("meta.kind") == "audio")
    got = {r["media_id"]: r for r in audio_features(auds).collect()}
    assert len(got) == auds.count() > 0
    for row in auds.select("media_id", "blob", "meta.sample_rate").collect():
        samples, sr = decode_wav(bytes(row["blob"]))
        assert sr == row["sample_rate"]
        want = float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
        assert got[row["media_id"]]["rms"] == pytest.approx(want)


def test_wav_rejects_unsupported_layout():
    import io
    import wave

    import numpy as np

    from wikidataquality_spark.operators.multimodal import decode_wav

    # stereo + 8-bit became SUPPORTED layouts (downmix / rescale); the reject
    # path now covers what decode_wav still can't represent: 24-bit samples
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(np.zeros(64 * 3, dtype=np.uint8).tobytes())
    with pytest.raises(ValueError, match="unsupported WAV layout"):
        decode_wav(buf.getvalue())


def test_truncated_ppmv_raises():
    """Bounds-guarded demux: a truncated blob raises instead of spinning."""
    import numpy as np

    from wikidataquality_spark.operators.multimodal import demux_ppmv, encode_ppmv

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8) for _ in range(3)]
    blob = encode_ppmv(frames)
    with pytest.raises(ValueError):
        list(demux_ppmv(blob[: len(blob) // 2 + 3]))


def test_truncated_ppmv_pixels_never_yields_short_frame():
    """A frame whose HEADER is complete but whose pixel bytes are cut short
    must raise, not be yielded as a clean frame (r04 review: downstream
    publishes every err-NULL frame as 'rescued' trusted bytes, so a silent
    short yield would ship corrupt pixels with a valid-looking sha256)."""
    from wikidataquality_spark.operators.multimodal import PPMV_MAGIC, demux_ppmv

    blob = PPMV_MAGIC + (1).to_bytes(4, "big") + b"P6\n8 8\n255\n" + bytes(10)
    with pytest.raises(ValueError, match="truncated PPMV frame pixel data at frame 0"):
        list(demux_ppmv(blob))

    # and mid-container: frame 0 still yields cleanly first
    from wikidataquality_spark.operators.multimodal import encode_ppm

    import numpy as np

    f0 = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    blob2 = PPMV_MAGIC + (2).to_bytes(4, "big") + f0 + b"P6\n8 8\n255\n" + bytes(10)
    out = []
    with pytest.raises(ValueError, match="truncated PPMV frame pixel data at frame 1"):
        for idx, frame in demux_ppmv(blob2):
            out.append((idx, frame))
    assert out == [(0, f0)]


def test_clip_ratio_counts_negative_rail(spark):
    """int16 abs overflow regression: np.abs(-32768) stays -32768, so
    full-scale NEGATIVE clipping was invisible to the old clip computation.
    A clip pinned to the negative rail must read clip_ratio 1.0."""
    import numpy as np

    from wikidataquality_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        encode_wav,
    )

    neg = np.full(400, -32768, dtype=np.int16)
    half = np.concatenate([np.full(200, -32768, dtype=np.int16),
                           np.zeros(200, dtype=np.int16)])
    rows = [
        (1, "t://a", bytearray(encode_wav(neg, 8000)),
         ("audio", "wav", None, None, None, 8000, 50)),
        (2, "t://b", bytearray(encode_wav(half, 8000)),
         ("audio", "wav", None, None, None, 8000, 50)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1)
    got = {r["media_id"]: r["clip_ratio"] for r in audio_features(df).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.5


def test_total_decode_poisoned_corpus_completes(spark):
    """r03 VERDICT #3: a poisoned corpus must COMPLETE, emitting one
    structured error row per corrupt blob — never a task-killing raise."""
    from wikidataquality_spark.operators.multimodal import (
        audio_features,
        corrupt_media,
        image_features,
        sample_frames,
        synthetic_media,
    )

    good = synthetic_media(spark, n=8)
    bad = corrupt_media(spark)
    both = good.unionByName(bad)

    imgs = image_features(both.filter(F.col("meta.kind") == "image"))
    rows = {r["media_id"]: r for r in imgs.collect()}
    assert rows[-200]["err"] == "ValueError: truncated PPM pixel data"
    assert rows[-201]["err"] == "ValueError: not a P6 PPM blob"
    assert rows[-200]["mean_luma"] is None
    assert rows[-200]["n_bytes"] == 45  # hash/len still computed for triage
    assert all(r["err"] is None for mid, r in rows.items() if mid >= 0)

    auds = audio_features(both.filter(F.col("meta.kind") == "audio"))
    arows = {r["media_id"]: r for r in auds.collect()}
    assert arows[-202]["err"] == "ValueError: not a RIFF/WAV blob"
    assert all(r["err"] is None for mid, r in arows.items() if mid >= 0)

    frames = sample_frames(both.filter(F.col("meta.kind") == "video"))
    frows = frames.collect()
    errs = [r for r in frows if r["err"] is not None]
    assert len(errs) == 1 and errs[0]["media_id"] == -203
    assert errs[0]["err"] == "ValueError: truncated PPMV frame header at frame 1"
    # the frame before the truncation point is rescued, and is decodable
    rescued = [r for r in frows if r["media_id"] == -203 and r["err"] is None]
    assert [r["frame_index"] for r in rescued] == [0]
    from wikidataquality_spark.operators.multimodal import decode_ppm

    assert decode_ppm(bytes(rescued[0]["frame_blob"])).shape == (4, 4, 3)


def test_decode_wav_stereo_downmix_and_8bit():
    """r03 VERDICT #7: stereo downmixes (l+r)//2; 8-bit rescales to int16."""
    import numpy as np

    from wikidataquality_spark.operators.multimodal import decode_wav, encode_wav

    stereo = np.stack(
        [np.full(10, 1000, dtype=np.int16), np.full(10, 3001, dtype=np.int16)],
        axis=1,
    )
    s, sr = decode_wav(encode_wav(stereo, 8000, nchannels=2))
    assert sr == 8000 and list(s) == [2000] * 10  # floor((1000+3001)/2)

    s8, sr8 = decode_wav(encode_wav(np.full(5, 192, dtype=np.uint8), 16000, sampwidth=1))
    assert sr8 == 16000 and list(s8) == [16384] * 5

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a RIFF/WAV blob"):
        decode_wav(b"\x00" * 32)


def test_zero_sample_rate_wav_is_error_row_not_crash(spark):
    """r04 review: stdlib wave READS a fmt chunk declaring framerate 0, and
    duration_ms = n*1000//sr sat OUTSIDE the per-blob try — one such blob
    ZeroDivisionErrored the task, the exact failure class total decode
    exists to prevent. decode_wav must reject it with a repo-constant
    ValueError so audio_features emits a structured err row."""
    import wave as _wave

    from wikidataquality_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    good = encode_wav(np.full(100, 5, dtype=np.int16), 8000)
    # byte-patch the fmt chunk's sample-rate field (offset 24, LE uint32)
    bad = bytearray(good)
    bad[24:28] = (0).to_bytes(4, "little")
    bad = bytes(bad)
    import io

    with _wave.open(io.BytesIO(bad), "rb") as w:  # precondition: wave reads it
        assert w.getframerate() == 0
    with pytest.raises(ValueError, match="invalid WAV sample rate"):
        decode_wav(bad)

    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))], "media_id long, blob binary"
    )
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert rows[1]["err"] is None and rows[1]["duration_ms"] == 12
    assert rows[2]["err"] == "ValueError: invalid WAV sample rate 0"
    assert rows[2]["duration_ms"] is None


def test_nondigit_header_tokens_raise_repo_constant_errors():
    """r04 review: bare int(b'ab') leaked stdlib ValueError wording (which
    may drift across Python versions) into the err column that oracle
    anchors pin; header parsing must raise this repo's own constants."""
    from wikidataquality_spark.operators.multimodal import (
        PPMV_MAGIC,
        decode_ppm,
        demux_ppmv,
        encode_ppm,
    )

    with pytest.raises(ValueError, match="^malformed PPM header field$"):
        decode_ppm(b"P6\nab cd ef\n" + bytes(16))
    with pytest.raises(ValueError, match="^malformed PPM header field$"):
        decode_ppm(b"P6\n-3 4 255\n" + bytes(36))  # negative = non-digit

    frame0 = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    blob = PPMV_MAGIC + (2).to_bytes(4, "big") + frame0 + b"P6\nxx 2\n255\n" + bytes(12)
    out = []
    with pytest.raises(
        ValueError, match="^malformed PPMV frame header at frame 1$"
    ):
        for item in demux_ppmv(blob):
            out.append(item)
    assert len(out) == 1  # the parseable prefix frame still demuxed


def test_sample_frames_null_n_frames_metadata(spark):
    """r04 review: the keep filter required meta.n_frames non-NULL even on
    the real demux path (which counts frames from the blob itself), so a
    corrupt container whose metadata extractor couldn't count frames was
    silently dropped with neither frames nor an error row. Real path must
    demux regardless; the fake path (which has no blob parse) must emit an
    error row, keeping the decode total."""
    from wikidataquality_spark.operators.multimodal import (
        PPMV_MAGIC,
        encode_ppm,
        encode_ppmv,
        sample_frames,
    )

    frames = [np.full((2, 2, 3), v, dtype=np.uint8) for v in (10, 20, 30)]
    good = encode_ppmv(frames)
    truncated = good[: len(good) - 5]  # last frame's pixel data cut short
    rows = [
        (1, bytearray(good), {"n_frames": None, "kind": "video"}),
        (2, bytearray(truncated), {"n_frames": None, "kind": "video"}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, blob binary, meta struct<n_frames: int, kind: string>",
    )
    out = sample_frames(media, every_nth=1).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # real demux ignores the NULL metadata: all 3 frames of the good blob
    assert sorted(r["frame_index"] for r in by_id[1]) == [0, 1, 2]
    assert all(r["err"] is None for r in by_id[1])
    # truncated blob: parseable prefix frames plus ONE error row
    errs = [r for r in by_id[2] if r["err"] is not None]
    assert len(errs) == 1 and errs[0]["frame_index"] == -1
    assert len(by_id[2]) >= 2  # at least one clean prefix frame demuxed

    fake = sample_frames(media, every_nth=1, deterministic_fake=True).collect()
    fake_by_id = {}
    for r in fake:
        fake_by_id.setdefault(r["media_id"], []).append(r)
    for mid in (1, 2):
        assert len(fake_by_id[mid]) == 1
        assert fake_by_id[mid][0]["err"] == "ValueError: missing n_frames metadata"


def test_zero_dimension_ppm_is_repo_constant_error():
    """A 'P6 0 0 255' header must raise our own ValueError: a (0,0,3) decode
    would sail through image_features as an err-NULL row whose empty-slice
    mean is NaN→NULL — a degenerate blob disguised as success (r04 review)."""
    from wikidataquality_spark.operators.multimodal import decode_ppm

    for header in (b"P6\n0 0\n255\n", b"P6\n0 5\n255\n", b"P6\n5 0\n255\n"):
        with pytest.raises(ValueError, match="zero-dimension PPM image"):
            decode_ppm(header)


def test_odd_byte_wav_truncation_is_repo_constant_error():
    """Chopping one byte off a 16-bit data chunk must yield OUR error string,
    not numpy's 'buffer size must be a multiple of element size' wording
    (err strings are repo constants stable across library versions)."""
    from wikidataquality_spark.operators.multimodal import decode_wav, encode_wav

    good = encode_wav(np.array([100, -200, 300, -400, 500], dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated WAV sample data"):
        decode_wav(good[:-1])


def test_zero_frame_container_gets_accounting_row(spark):
    """A PPMV with frame count 0 must emit ONE error row, not vanish with
    neither frames nor errors — the silent loss the err column exists to
    prevent (r04 review). Same for the deterministic_fake path."""
    from wikidataquality_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PPMV_MAGIC,
        sample_frames,
    )

    empty_container = PPMV_MAGIC + (0).to_bytes(4, "big")
    rows = [
        (1, "u1", bytearray(empty_container), ("video", "ppmv", 4, 4, 0, None, 100)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for fake in (False, True):
        out = sample_frames(df, deterministic_fake=fake).collect()
        assert len(out) == 1, f"fake={fake}"
        r = out[0]
        assert r["frame_index"] == -1 and r["frame_blob"] is None
        assert r["err"] == "ValueError: zero-frame container"


def test_video_meta_matches_encoded_frame_dims(spark):
    """The fixture's metadata must describe its decodable content: every
    video's meta.width/height equals the demuxed first frame's dims, so a
    metadata_filter → decode composition is consistent (r04 review)."""
    from wikidataquality_spark.operators.multimodal import (
        decode_ppm,
        demux_ppmv,
        synthetic_media,
    )

    vids = (
        synthetic_media(spark, n=16)
        .filter(F.col("meta.kind") == "video")
        .select("meta.width", "meta.height", "blob")
        .collect()
    )
    assert vids
    for r in vids:
        _, first = next(demux_ppmv(bytes(r["blob"])))
        h, w = decode_ppm(first).shape[:2]
        assert (r["width"], r["height"]) == (w, h)

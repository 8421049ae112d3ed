"""Perceptual image-hash near-dup gates: exact hash anchors, a brute-force
mirror of the banding/anchor semantics, planted retouch recall, the flat-
image (dHash≡0) false-positive guard, and decode totality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from wikidataquality_spark.operators.mediahash import (
    DHASH_BANDS,
    DHASH_LUMA_TOL,
    DHASH_MAX_HAMMING,
    dhash64,
    dhash_features,
    image_neardup_marks,
)
from wikidataquality_spark.operators.multimodal import encode_ppm


def _rgb(luma: np.ndarray) -> np.ndarray:
    return np.repeat(luma[:, :, None], 3, axis=2).astype(np.uint8)


def _seeded_image(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)


def test_dhash_exact_anchors():
    # constant image: every gradient 0 → all bits 0
    sig, gl = dhash64(np.full((16, 18), 7, dtype=np.uint8))
    assert sig == 0 and gl == 7
    # strictly increasing columns: every gradient positive → all 64 bits set
    # → int64 two's-complement -1
    ramp = np.tile(np.arange(0, 90, 10, dtype=np.uint8), (8, 1))
    sig, gl = dhash64(ramp)
    assert sig == -1 and gl == int(np.arange(0, 90, 10).mean())
    # tiny images upsample deterministically, never raise
    sig_tiny, _ = dhash64(np.array([[0, 255]], dtype=np.uint8))
    assert isinstance(sig_tiny, int)
    with pytest.raises(ValueError):
        dhash64(np.zeros((0, 5), dtype=np.uint8))


def test_dhash_retouch_flips_few_bits():
    base = _seeded_image(3)
    sig0, _ = dhash64(base)
    retouched = base.copy()
    retouched[4:7, 9:12] += 40  # small local edit (uint8 wrap is fine)
    sig1, _ = dhash64(retouched)
    ham = bin((sig0 ^ sig1) & (2**64 - 1)).count("1")
    assert ham <= DHASH_MAX_HAMMING
    other, _ = dhash64(_seeded_image(4))
    assert bin((sig0 ^ other) & (2**64 - 1)).count("1") > DHASH_MAX_HAMMING


def _mirror_marks(rows: list[tuple[int, int, int]]) -> dict[int, int | None]:
    """Pure-python mirror of image_neardup_marks' anchor semantics over
    (id, dhash, grid_luma) rows: per band-bucket, min-id row is the anchor;
    a row is flagged iff it verifies (hamming + luma) against the anchor of
    ANY of its buckets; neardup_of = the smallest verified anchor."""
    width = 64 // DHASH_BANDS
    buckets: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
    for rid, sig, luma in rows:
        for b in range(DHASH_BANDS):
            key = (b, ((sig & (2**64 - 1)) >> (b * width)) & ((1 << width) - 1))
            buckets.setdefault(key, []).append((rid, sig, luma))
    out: dict[int, int | None] = {rid: None for rid, _, _ in rows}
    for members in buckets.values():
        aid, asig, aluma = min(members)
        for rid, sig, luma in members:
            if rid == aid:
                continue
            ham = bin((sig ^ asig) & (2**64 - 1)).count("1")
            if ham <= DHASH_MAX_HAMMING and abs(luma - aluma) <= DHASH_LUMA_TOL:
                out[rid] = aid if out[rid] is None else min(out[rid], aid)
    return out


def test_marks_match_brute_force_mirror_and_flag_planted_pair(spark):
    imgs = {i: _seeded_image(i) for i in range(1, 7)}
    near = imgs[2].copy()
    near[0:3, 0:3] ^= 9  # light retouch of image 2
    imgs[7] = near
    media = spark.createDataFrame(
        [Row(media_id=i, blob=encode_ppm(_rgb(px))) for i, px in imgs.items()]
    )
    feats = dhash_features(media)
    marks = image_neardup_marks(feats).collect()
    got = {r["media_id"]: r["neardup_of"] for r in marks}
    mirror = _mirror_marks(
        [(r["media_id"], r["dhash"], r["grid_luma"]) for r in feats.collect()]
    )
    assert got == mirror
    assert got[7] == 2  # planted retouch resolves to its source
    assert all(v is None for i, v in got.items() if i != 7)  # no false flags
    flags = {r["media_id"]: r["is_image_neardup"] for r in marks}
    assert flags[7] is True and flags[2] is False  # anchor survives


def test_flat_images_do_not_merge_across_luma(spark):
    media = spark.createDataFrame(
        [
            Row(media_id=1, blob=encode_ppm(_rgb(np.zeros((16, 16), np.uint8)))),
            Row(media_id=2, blob=encode_ppm(_rgb(np.full((16, 16), 255, np.uint8)))),
            Row(media_id=3, blob=encode_ppm(_rgb(np.full((16, 16), 3, np.uint8)))),
        ]
    )
    rows = {r["media_id"]: r for r in image_neardup_marks(dhash_features(media)).collect()}
    # all three share dhash 0 and every band bucket; only the luma guard
    # separates black from white — the luma-close pair (1, 3) still merges
    assert rows[2]["is_image_neardup"] is False
    assert rows[3]["is_image_neardup"] is True and rows[3]["neardup_of"] == 1
    assert rows[1]["is_image_neardup"] is False


def _audio_signal(seed: int, n: int = 8000) -> np.ndarray:
    """Noise carrier under a piecewise-random envelope: adjacent window
    energies differ substantially, so gradient signs are envelope-driven
    (a pure tone would have a flat envelope and noise-driven signs)."""
    rng = np.random.default_rng(seed)
    env = np.repeat(rng.uniform(0.1, 1.0, size=65), -(-n // 65))[:n]
    x = rng.normal(0.0, 1.0, n) * env * 12000
    return np.clip(x, -32000, 32000).astype(np.int16)


def test_audio_fingerprint_requantization_invariance(spark):
    from wikidataquality_spark.operators.mediahash import (
        audio_fingerprints,
        audio_neardup_marks,
        audio_sig64,
    )
    from wikidataquality_spark.operators.multimodal import encode_wav

    x = _audio_signal(11)
    sig16, _ = audio_sig64(x)
    # positive rescaling preserves every gradient sign exactly
    sig_scaled, _ = audio_sig64((x.astype(np.int32) // 2).astype(np.int16))
    assert sig16 == sig_scaled

    wav16 = encode_wav(x, 8000)
    x8 = ((x.astype(np.int32) // 256) + 128).astype(np.uint8)  # 8-bit requant
    wav8 = encode_wav(x8, 8000, sampwidth=1)
    wav_other = encode_wav(_audio_signal(12), 8000)
    media = spark.createDataFrame(
        [
            Row(media_id=1, blob=wav16),
            Row(media_id=2, blob=wav8),
            Row(media_id=3, blob=wav_other),
            Row(media_id=4, blob=b"RIFFjunk"),
        ]
    )
    feats = audio_fingerprints(media)
    rows = {r["media_id"]: r for r in audio_neardup_marks(feats).collect()}
    assert rows[2]["is_audio_neardup"] is True and rows[2]["neardup_of"] == 1
    assert rows[1]["is_audio_neardup"] is False  # anchor survives
    assert rows[3]["is_audio_neardup"] is False  # different envelope
    assert rows[4]["is_audio_neardup"] is False and rows[4]["err"] is not None


def test_video_neardup_frame_majority(spark):
    from wikidataquality_spark.operators.mediahash import (
        frame_dhash_features,
        video_neardup_marks,
    )
    from wikidataquality_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_ppmv,
        sample_frames,
    )

    def frames(seed, n=12):
        return [_rgb(_seeded_image(seed * 100 + i, 16, 16)) for i in range(n)]

    fa = frames(1)
    fb = [f.copy() for f in fa]
    for f in fb:
        f[2:4, 2:4, :] ^= 9  # light retouch of every frame
    fc = frames(2)

    def media_row(mid, fs):
        return Row(
            media_id=mid,
            url=f"v{mid}",
            blob=encode_ppmv(fs),
            meta=Row(
                kind="video", format="ppmv", width=16, height=16,
                n_frames=len(fs), sample_rate=None, duration_ms=None,
            ),
        )

    corrupt = Row(
        media_id=4, url="v4", blob=b"not-a-ppmv-container",
        meta=Row(kind="video", format="ppmv", width=None, height=None,
                 n_frames=None, sample_rate=None, duration_ms=None),
    )
    media = spark.createDataFrame(
        [media_row(1, fa), media_row(2, fb), media_row(3, fc), corrupt],
        schema=MEDIA_SCHEMA,
    )
    feats = frame_dhash_features(sample_frames(media, every_nth=5))
    assert feats.filter("err is not null").count() == 1  # the corrupt demux
    marks = {r["media_id"]: r for r in video_neardup_marks(feats).collect()}
    # totality: the all-corrupt video keeps an accounting row (0 hashed
    # frames, unflagged) instead of vanishing from the marks table
    assert marks[4]["total_frames"] == 0 and marks[4]["is_video_neardup"] is False
    assert marks[1]["total_frames"] == 3  # frames 0, 5, 10 sampled
    assert marks[2]["is_video_neardup"] is True and marks[2]["neardup_of"] == 1
    assert marks[2]["matched_frames"] >= 2
    assert marks[1]["is_video_neardup"] is False  # anchor video survives
    assert marks[3]["is_video_neardup"] is False


def test_decode_totality_and_null_exemption(spark):
    good = encode_ppm(_rgb(_seeded_image(5)))
    media = spark.createDataFrame(
        [
            Row(media_id=1, blob=good),
            Row(media_id=2, blob=b"JUNK-not-a-ppm"),
            Row(media_id=3, blob=None),
        ]
    )
    feats = dhash_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2}  # NULL blob dropped, nothing to hash
    assert rows[1]["err"] is None and rows[1]["dhash"] is not None
    assert rows[2]["err"] is not None and rows[2]["dhash"] is None
    marks = {r["media_id"]: r for r in image_neardup_marks(feats).collect()}
    # the error row rides through unflagged — NULL hashes never bucket
    assert marks[2]["is_image_neardup"] is False and marks[2]["neardup_of"] is None

"""Perceptual image-hash near-dup — the image-modality member of the dedup
family (exact / MinHash-Jaccard / SimHash-cosine / embedding-LSH / THIS).

Parity: UniqueValueChecker's cross-row uniqueness ethos
(ref≈includes/ConstraintCheck/Checker/UniqueValueChecker.php:~30-80) applied
to the media table: a training-data crawl carries the same image re-encoded,
re-scaled, and lightly retouched thousands of times, and pixel-exact hashing
misses all of it. dHash (difference hash, the standard perceptual baseline):
decode → 8×9 block-mean luma grid → 64 horizontal-gradient sign bits. Small
retouches flip few bits, so near-dup = small Hamming distance.

Scale design (identical shape to dedup.simhash_dedup, same pigeonhole
banding): hashes are one mapInPandas decode pass (TOTAL — corrupt blobs
become error rows, never dead tasks); banding explodes to B key rows per
image; the bucket anchor comes from ONE min(struct) window; verification is
inline bit_count(xor). Everything after the decode moves ≤24-byte rows —
blobs never shuffle.

dHash is gradient-based, so EVERY flat image (any solid color) hashes to 0:
without a guard, all-black and all-white would verify at Hamming 0 and
merge. The grid's mean luma rides along as a second verify term
(|luma_a − luma_b| ≤ tol) to kill exactly that class of false positive.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from wikidataquality_spark.operators.multimodal import _err_str, decode_ppm

DHASH_GRID_H = 8
DHASH_GRID_W = 9  # 9 columns → 8 horizontal gradients per row → 64 bits

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),  # NULL on decode error
        T.StructField("grid_luma", T.IntegerType(), True),  # 0..255 grid mean
        T.StructField("err", T.StringType(), True),  # NULL on success
    ]
)

# Banding for the bucket join: 8 bands of 8 bits guarantees (pigeonhole) a
# shared band for any pair with Hamming ≤ 7 — image retouches flip more bits
# than text-simhash token edits, so the image threshold is wider than
# dedup.SIMHASH_MAX_HAMMING and needs the denser banding. Candidate sets
# stay bounded: media tables are orders of magnitude smaller than the text
# corpus and bucket rows are ≤24 bytes.
DHASH_BANDS = 8
DHASH_MAX_HAMMING = 7
DHASH_LUMA_TOL = 8


def dhash64(luma: np.ndarray) -> tuple[int, int]:
    """(dhash, grid_mean_luma) of a 2-D uint8 luma array. Deterministic
    integer/stride arithmetic only — same array, same hash, any host:
      - images smaller than the grid are integer-upsampled by np.repeat;
      - block sums via np.add.reduceat at floor-spaced boundaries;
      - bit (r, c) = 1 iff block[r, c+1] > block[r, c], packed row-major
        (r*8+c is the bit index from the LSB)."""
    h, w = luma.shape
    if h == 0 or w == 0:
        raise ValueError("dhash: empty image")
    if h < DHASH_GRID_H:
        luma = np.repeat(luma, -(-DHASH_GRID_H // h), axis=0)
    if w < DHASH_GRID_W:
        luma = np.repeat(luma, -(-DHASH_GRID_W // w), axis=1)
    h, w = luma.shape
    rb = (np.arange(DHASH_GRID_H) * h) // DHASH_GRID_H
    cb = (np.arange(DHASH_GRID_W) * w) // DHASH_GRID_W
    sums = np.add.reduceat(np.add.reduceat(luma.astype(np.int64), rb, axis=0), cb, axis=1)
    rows = np.diff(np.append(rb, h))
    cols = np.diff(np.append(cb, w))
    block = sums / (rows[:, None] * cols[None, :])  # float block means
    bits = (block[:, 1:] > block[:, :-1]).astype(np.uint64)
    sig = np.uint64(0)
    for idx in np.nonzero(bits.reshape(-1))[0]:
        sig |= np.uint64(1) << np.uint64(idx)
    return int(sig.astype(np.int64)), int(block.mean())


def dhash_features(media: DataFrame) -> DataFrame:
    """(media_id, blob) → (media_id, dhash, grid_luma, err): one iterator
    mapInPandas decode pass, total in the multimodal sense. NULL blobs are
    dropped (nothing to hash); corrupt blobs yield error rows with NULL
    hash, which every downstream banding step exempts (a constant error
    hash would otherwise hub-bucket exactly like xxhash64(NULL))."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf["blob"].notna()]
            rows = []
            for mid, blob in zip(keep["media_id"], keep["blob"]):
                base = {"media_id": int(mid)}
                try:
                    px = decode_ppm(bytes(blob))
                    luma = (px.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
                    sig, gl = dhash64(luma)
                except Exception as e:  # noqa: BLE001 — totality on purpose
                    rows.append(
                        {**base, "dhash": None, "grid_luma": None, "err": _err_str(e)}
                    )
                    continue
                rows.append({**base, "dhash": sig, "grid_luma": gl, "err": None})
            yield pd.DataFrame(rows, columns=[f.name for f in DHASH_SCHEMA.fields])

    return media.select("media_id", "blob").mapInPandas(process, DHASH_SCHEMA)


def dhash_band_keys(sig_col: str | Column = "dhash") -> Column:
    """DHASH_BANDS keys of 8 bits each, tagged by band index (same
    construction as dedup.simhash_band_keys)."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    width = 64 // DHASH_BANDS
    keys = [
        F.xxhash64(
            F.lit(i),
            F.shiftrightunsigned(sig, i * width).bitwiseAND(F.lit((1 << width) - 1)),
        )
        for i in range(DHASH_BANDS)
    ]
    return F.array(*keys)


def image_neardup_marks(
    features: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = DHASH_MAX_HAMMING,
    luma_tol: int = DHASH_LUMA_TOL,
) -> DataFrame:
    """Annotate dhash_features output with (is_image_neardup, neardup_of):
    greedy min-anchor LSH semantics exactly as dedup.simhash_dedup — each
    image is verified only against its buckets' minimum-id row (recall
    bounded by anchor choice, precision never: every flag is verified by
    exact Hamming + luma distance). neardup_of is the smallest verified
    anchor id; the anchor itself (and every error/hashless row) is never
    flagged, so at least one copy always survives."""
    hashed = features.filter(F.col("dhash").isNotNull())
    bands = hashed.select(
        id_col,
        "dhash",
        "grid_luma",
        F.explode(dhash_band_keys("dhash")).alias("_bk"),
    )
    anchor = F.min(
        F.struct(
            F.col(id_col).alias("i"),
            F.col("dhash").alias("s"),
            F.col("grid_luma").alias("l"),
        )
    ).over(W.partitionBy("_bk"))
    flagged = (
        bands.withColumn("_anchor", anchor)
        .filter(F.col(id_col) != F.col("_anchor")["i"])
        .filter(
            (
                F.bit_count(F.col("dhash").bitwiseXOR(F.col("_anchor")["s"]))
                <= max_hamming
            )
            & (F.abs(F.col("grid_luma") - F.col("_anchor")["l"]) <= luma_tol)
        )
        .groupBy(id_col)
        .agg(F.min(F.col("_anchor")["i"]).alias("neardup_of"))
    )
    return (
        features.join(flagged, id_col, "left")
        .withColumn("is_image_neardup", F.col("neardup_of").isNotNull())
    )

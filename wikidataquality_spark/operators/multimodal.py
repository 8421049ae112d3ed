"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media ride through the engine as opaque `binary` columns with a typed
metadata struct — exactly how the pipeline already treats `html:binary`
(BASELINE.json:15). The Spark-side machinery (schemas, batch iteration,
partition sizing, UDF signatures) is real and tested; the *codec* calls are
stubbed because this container has no image/audio libraries: decode functions
raise NotImplementedError unless `deterministic_fake=True`, in which case a
seeded, content-derived fake is produced so the plumbing is testable
end-to-end. A real Pillow/torchaudio/ffmpeg decoder drops into `_decode_*`
behind the same signature.

Design rules for 100 TB of media:
  - mapInPandas (not a scalar UDF) so one Arrow batch of N blobs is handled
    per call and the decode loop can early-drop rows (smaller output than
    input — scalar UDFs must be 1:1);
  - metadata (width/height/duration/codec) lives in a separate small struct
    column so filters like `meta.width >= 64` prune BEFORE any blob is
    decoded, and Parquet column pruning keeps blobs on disk for metadata-only
    queries;
  - blobs never enter a shuffle: repartition/joins key on (media_id, meta),
    and the decode stage runs AFTER any re-distribution.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("format", T.StringType(), True),  # png, wav, mp4, ...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_TYPE, True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("resized_w", T.IntegerType(), True),
        T.StructField("resized_h", T.IntegerType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_blob", T.BinaryType(), True),
    ]
)


def _fake_pixels(blob: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic content-derived stand-in for a real decode: bytes of
    sha256(blob) tiled to (h, w). Same blob → same pixels, any process."""
    digest = hashlib.sha256(blob).digest()
    base = np.frombuffer(digest, dtype=np.uint8)
    reps = int(np.ceil(w * h / len(base)))
    return np.tile(base, reps)[: w * h].reshape(h, w)


def _decode_image(blob: bytes, deterministic_fake: bool) -> np.ndarray:
    """STUB: real impl = PIL.Image.open(io.BytesIO(blob)) → np.asarray.
    Pillow is not in this container."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires Pillow; pass deterministic_fake=True for "
            "the plumbing-test path"
        )
    return _fake_pixels(blob, 32, 32)


def image_features(
    media: DataFrame,
    target_w: int = 16,
    target_h: int = 16,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode → resize → per-image features, one Arrow batch at a time.

    The resize here is a stride slice of the decoded array (deterministic,
    library-free); a real bilinear resize swaps in without touching the
    Spark plan. Rows with NULL blobs are dropped (mapInPandas may shrink)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf["blob"].notna()]
            rows = []
            for media_id, blob in zip(keep["media_id"], keep["blob"]):
                px = _decode_image(bytes(blob), deterministic_fake)
                sy = max(px.shape[0] // target_h, 1)
                sx = max(px.shape[1] // target_w, 1)
                resized = px[::sy, ::sx][:target_h, :target_w]
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(blob),
                        "content_hash": hashlib.sha256(bytes(blob)).hexdigest(),
                        "mean_luma": float(resized.mean()),
                        "resized_w": int(resized.shape[1]),
                        "resized_h": int(resized.shape[0]),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields],
            )

    return media.select("media_id", "blob").mapInPandas(process, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_nth: int = 10,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Video frame sampling: emit every_nth frame as its own row (1:N output —
    the mapInPandas shape a scalar UDF cannot express). Frame extraction is
    stubbed: real impl = pyav/ffmpeg demux; the fake derives each frame blob
    from sha256(blob, frame_index)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            keep = pdf[pdf["blob"].notna() & pdf["n_frames"].notna()]
            for media_id, blob, n_frames in zip(
                keep["media_id"], keep["blob"], keep["n_frames"]
            ):
                if not deterministic_fake:
                    raise NotImplementedError(
                        "video demux requires ffmpeg/pyav; pass "
                        "deterministic_fake=True for the plumbing-test path"
                    )
                for idx in range(0, int(n_frames), every_nth):
                    frame = hashlib.sha256(bytes(blob) + idx.to_bytes(4, "big")).digest()
                    out.append(
                        {"media_id": media_id, "frame_index": idx, "frame_blob": frame}
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return media.select("media_id", "blob", F.col("meta.n_frames").alias("n_frames")).mapInPandas(
        process, FRAME_SAMPLE_SCHEMA
    )


def metadata_filter(media: DataFrame, min_w: int = 64, min_h: int = 64) -> DataFrame:
    """Blob-free pruning: reads only the meta struct (Parquet column pruning
    leaves blob pages on disk), so the decode stage sees a reduced set."""
    return media.filter(
        (F.col("meta.width") >= min_w) & (F.col("meta.height") >= min_h)
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture table matching MEDIA_SCHEMA (tests/bench only)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "image", "image", "video"]
    for i in range(n):
        kind = kinds[i % len(kinds)]
        blob = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                f"https://media.example.com/{kind}/{i}",
                bytearray(blob),
                (
                    kind,
                    "png" if kind == "image" else "mp4",
                    int(rng.integers(16, 256)),
                    int(rng.integers(16, 256)),
                    None if kind == "image" else int(rng.integers(30, 120)),
                    None,
                    None if kind == "image" else int(rng.integers(1000, 60000)),
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

"""Corpus-level deduplication (SURVEY.md §2A#7, §2B "Dedup").

Parity: UniqueValueChecker (ref≈includes/ConstraintCheck/Checker/
UniqueValueChecker.php:~30-80) — the one reference rule that is cross-row.
The reference answered it with per-value SQL point lookups; at 10^12 docs the
Spark-native answer is a shuffle:

  exact:   hash(text) → window(row_number) → keep first        (1 shuffle)
  near:    MinHash signatures → LSH band buckets → min-url      (1 UDF + 1 shuffle)

Survivor choice is a deterministic TOTAL order (min url, SURVEY §7 hard-#3),
so results are invariant under repartitioning — verified by property test.

Scale notes (10^12 docs / 1000 executors):
  - The exact-dedup shuffle moves (hash8B, url) pairs, never document bodies:
    dedup keys are projected before the shuffle, bodies rejoin via the kept
    urls (left_semi), which AQE plans as a broadcast when the survivor set is
    partition-local.
  - MinHash banding emits B rows per doc (B band keys); band-bucket skew is
    bounded because identical signatures collapse into the same bucket — the
    pathological case (boilerplate cluster of millions) is exactly the case
    AQE skew-split + the salted groupBy below are for.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

# MinHash geometry: H hashes = B bands × R rows. Jaccard threshold ≈ (1/B)^(1/R)
# → B=16, R=8 ⇒ ~0.71; near-dup pairs (1 sentence changed of ~6) sit well above.
MINHASH_H = 128
MINHASH_BANDS = 16
MINHASH_ROWS = 8
SHINGLE_K = 3

_MERSENNE_P = np.uint64((1 << 61) - 1)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Keep the minimum-id row per identical text. The window partitions by
    (xxhash64, length) so the shuffle key is 16 bytes, not the document."""
    w = W.partitionBy(F.xxhash64(text_col), F.length(text_col)).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _hash_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_P, size=MINHASH_H, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE_P, size=MINHASH_H, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str) -> np.ndarray:
    """k-word shingles → stable 61-bit FNV-1a hashes."""
    toks = text.lower().split()
    if len(toks) < SHINGLE_K:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i : i + SHINGLE_K]) for i in range(len(toks) - SHINGLE_K + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(0xCBF29CE484222325)
        for byte in s.encode("utf-8"):
            h = np.uint64((int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h & np.uint64((1 << 61) - 1)
    return out


def _minhash_sig(base: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (a*x + b) mod 2^64 with odd a — multiply-shift hash family; uint64
    # wraparound is the modulus. min over shingles per hash function.
    vals = a[:, None] * base[None, :] + b[:, None]
    return vals.min(axis=1).astype(np.int64)


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    a, b = _hash_params()  # once per worker
    a = a | np.uint64(1)  # odd multipliers
    for texts in batches:
        sigs = []
        for t in texts:
            if t is None:
                sigs.append(None)
                continue
            base = _shingle_hashes(t)
            sigs.append(_minhash_sig(base, a, b).tolist())
        yield pd.Series(sigs, index=texts.index)


def band_keys(sig_col: str | Column = "minhash_sig") -> Column:
    """B band keys per signature: xxhash64(band_index, signature slice)."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    keys = [
        F.xxhash64(F.lit(i), F.slice(sig, i * MINHASH_ROWS + 1, MINHASH_ROWS))
        for i in range(MINHASH_BANDS)
    ]
    return F.array(*keys)


def minhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Drop near-duplicates: a row is dropped when any LSH band bucket contains
    a row with a smaller id (deterministic min-id survivor per bucket).

    Plan shape: one pandas-UDF projection (signatures), one explode (B rows/doc,
    key+id only), one groupBy(band_key) shuffle for bucket minima, one
    broadcast-able join back, one left_anti against the dropped-id set.
    """
    sigs = df.select(F.col(id_col), minhash_udf(F.col(text_col)).alias("_sig"))
    bands = sigs.select(
        id_col, F.explode(band_keys(F.col("_sig"))).alias("_band_key")
    )
    bucket_min = bands.groupBy("_band_key").agg(F.min(id_col).alias("_keep_id"))
    dropped = (
        bands.join(bucket_min, "_band_key")
        .filter(F.col(id_col) != F.col("_keep_id"))
        .select(id_col)
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def dup_marks(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Non-destructive variant: annotate rows with is_exact_dup / is_near_dup
    flags so the rule layer can emit violation records instead of dropping."""
    exact_w = W.partitionBy(F.xxhash64(text_col), F.length(text_col)).orderBy(id_col)
    marked = df.withColumn("_ern", F.row_number().over(exact_w)).withColumn(
        "is_exact_dup", F.col("_ern") > 1
    )

    sigs = df.select(F.col(id_col), minhash_udf(F.col(text_col)).alias("_sig"))
    bands = sigs.select(id_col, F.explode(band_keys(F.col("_sig"))).alias("_band_key"))
    bucket_min = bands.groupBy("_band_key").agg(F.min(id_col).alias("_keep_id"))
    near = (
        bands.join(bucket_min, "_band_key")
        .filter(F.col(id_col) != F.col("_keep_id"))
        .select(id_col)
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
    return (
        marked.join(near, id_col, "left")
        .withColumn("is_near_dup", F.coalesce("is_near_dup", F.lit(False)))
        .drop("_ern")
    )


# ---------------------------------------------------------------------------
# Skew handling (BASELINE.json:6: hash-partition by url-host with salting)
# ---------------------------------------------------------------------------


def host_of(url_col: str | Column = "url") -> Column:
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.parse_url(col, F.lit("HOST"))


def repartition_by_host_salted(
    df: DataFrame,
    n_partitions: int,
    url_col: str = "url",
    hot_fraction: float = 0.05,
    n_salts: int = 16,
) -> DataFrame:
    """Hash-partition by url-host, salting hosts that exceed hot_fraction of
    rows so no partition is dominated by one domain (explicit-salting mandate
    of BASELINE.json:6; AQE skew-join remains on as the safety net).

    The hot-host set comes from a cheap pre-aggregation (count per host) —
    at production scale that is a sample-based sketch; the set is tiny and is
    broadcast inside the `isin` literal."""
    host = host_of(url_col)
    total = df.count()
    hot = [
        r["host"]
        for r in df.groupBy(host.alias("host"))
        .count()
        .filter(F.col("count") > hot_fraction * total)
        .collect()
    ]
    salt = F.when(
        host.isin(hot), F.pmod(F.xxhash64(url_col), F.lit(n_salts))
    ).otherwise(F.lit(0))
    return df.repartition(n_partitions, host, salt)

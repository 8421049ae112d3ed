"""Text analysis operators: token counting, fingerprinting, n-gram Jaccard,
quality scoring (training-data pipeline ops from the task brief).

Everything here is pure Column expressions (codegen, oracle-comparable) except
simhash64, which packs bits driver-side-free inside one expression tree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wikidataquality_spark.operators.heuristics import (
    alpha_ratio,
    distinct_word_ratio,
    mean_word_len,
    stopword_ratio,
    symbol_ratio,
    words_col,
)


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word-piece units — alternating
    letter-runs, digit-runs, and single punctuation (the regex families real
    BPE pre-tokenizers split on)."""
    pieces = F.regexp_extract_all(
        text, F.lit(r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"), 0
    )
    return F.size(pieces)


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of word n-grams (join of sliding windows) — the shingle set."""
    words = words_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.when(F.size(words) >= n, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )).otherwise(F.array(F.concat_ws(" ", words)))


def ngram_jaccard(a_ngrams: Column, b_ngrams: Column) -> Column:
    """Jaccard similarity of two n-gram arrays (distinct semantics)."""
    ad, bd = F.array_distinct(a_ngrams), F.array_distinct(b_ngrams)
    inter = F.size(F.array_intersect(ad, bd))
    union = F.size(ad) + F.size(bd) - inter
    return inter / F.nullif(union.cast("double"), F.lit(0.0))


FP_PRIME = 1_099_511_627_689  # prime ≈ 2^40: (acc*131 + cp) stays < 2^48, no
# BIGINT overflow in either engine (DuckDB errors on overflow; Java wraps)


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over words (document fingerprint): a stable
    content id that is whitespace-normalization-invariant. Nested modular
    polynomial (chars within word, words within doc) — pure aggregate
    expression with identical integer semantics in Spark and the DuckDB
    oracle (no engine-specific hash function)."""
    words = words_col(text)
    p = F.lit(FP_PRIME).cast("long")

    def word_poly(w: Column) -> Column:
        return F.aggregate(
            F.transform(F.split(w, ""), lambda c: F.ascii(c).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 131 + x) % p,
        )

    return F.aggregate(
        F.transform(words, word_poly),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % p,
    )


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: weighted blend of the Gopher/C4
    heuristic signals (a cheap ranking signal for curriculum sampling)."""
    words = words_col(text)
    mwl = mean_word_len(words)
    mwl_ok = F.when((mwl >= 3) & (mwl <= 10), 1.0).otherwise(0.0)
    stop = F.least(stopword_ratio(words) * 5, F.lit(1.0))
    sym = F.greatest(F.lit(1.0) - symbol_ratio(text) * 5, F.lit(0.0))
    dwr = distinct_word_ratio(words)
    alpha = alpha_ratio(text)
    return (mwl_ok * 0.2 + stop * 0.2 + sym * 0.2 + dwr * 0.2 + alpha * 0.2).alias(
        "quality_score"
    )

"""Text-analysis operators: fingerprints, n-grams, quality scores."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.textstats import (
    FP_PRIME,
    bpe_ish_token_count,
    ngram_jaccard,
    quality_score,
    rolling_fingerprint,
    word_ngrams,
)


def test_fingerprint_matches_python_reference(spark):
    def py_fp(text: str) -> int:
        acc = 0
        for w in text.strip().split():
            wp = 0
            for ch in w:
                wp = (wp * 131 + ord(ch)) % FP_PRIME
            acc = (acc * 31 + wp) % FP_PRIME
        return acc

    rows = [("the cat sat",), ("the  cat   sat",), ("different doc",)]
    df = spark.createDataFrame(rows, "text string")
    got = [r[0] for r in df.select(rolling_fingerprint(F.col("text"))).collect()]
    assert got[0] == py_fp("the cat sat")
    assert got[0] == got[1], "whitespace-normalization-invariant"
    assert got[2] != got[0]


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    grams = df.select(word_ngrams(F.col("text"), 3).alias("g")).collect()[0]["g"]
    assert grams == ["a b c", "b c d"]


def test_ngram_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame([("x", "a b c d", "a b c d"), ("y", "a b c d", "p q r s")],
                               "k string, t1 string, t2 string")
    out = df.select(
        "k",
        ngram_jaccard(word_ngrams(F.col("t1"), 2), word_ngrams(F.col("t2"), 2)).alias("j"),
    ).collect()
    by_k = {r["k"]: r["j"] for r in out}
    assert by_k["x"] == pytest.approx(1.0)
    assert by_k["y"] == 0.0


def test_bpe_ish_count(spark):
    df = spark.createDataFrame([("ab12,cd ef",)], "text string")
    n = df.select(bpe_ish_token_count(F.col("text")).alias("n")).collect()[0]["n"]
    assert n == 5  # ab | 12 | , | cd | ef


def test_quality_score_ranks_clean_above_junk(spark):
    rows = [
        ("clean", "the cat sat on a mat and the dog ran to the park in town"),
        ("junk", "zzzz zzzz zzzz !!!! @@@@ #### zzzz zzzz"),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    out = {r["k"]: r["q"] for r in df.select("k", quality_score(F.col("text")).alias("q")).collect()}
    assert out["clean"] > out["junk"]

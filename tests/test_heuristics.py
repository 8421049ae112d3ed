"""Heuristic stat correctness on hand-computable fixtures."""

from __future__ import annotations

import pytest

from wikidataquality_spark.operators.heuristics import with_doc_stats


@pytest.fixture(scope="module")
def stats(spark):
    rows = [
        (1, "the cat sat on a mat"),
        (2, "aa aa aa aa"),
        (3, "x!! y?? z##"),
        (4, ""),
        (5, "  padded   tokens  here  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_doc_stats(df).collect()
    return {r["doc_id"]: r for r in out}


def test_word_counts(stats):
    assert stats[1]["n_words_stat"] == 6
    assert stats[5]["n_words_stat"] == 3  # trim + \s+ split kills padding


def test_mean_word_len(stats):
    # the,cat,sat,on,a,mat → 3+3+3+2+1+3 = 15 / 6
    assert stats[1]["mean_word_len_stat"] == pytest.approx(15 / 6)


def test_stopword_ratio(stats):
    # 'the' and 'a' are stopwords → 2/6
    assert stats[1]["stopword_ratio_stat"] == pytest.approx(2 / 6)
    assert stats[2]["stopword_ratio_stat"] == 0.0


def test_symbol_ratio(stats):
    # "x!! y?? z##": 6 symbols of 11 chars
    assert stats[3]["symbol_ratio_stat"] == pytest.approx(6 / 11)
    assert stats[1]["symbol_ratio_stat"] == 0.0


def test_distinct_word_ratio(stats):
    assert stats[2]["distinct_word_ratio_stat"] == pytest.approx(1 / 4)
    assert stats[1]["distinct_word_ratio_stat"] == 1.0


def test_alpha_ratio(stats):
    assert stats[1]["alpha_ratio_stat"] == pytest.approx(15 / 20)


def test_empty_doc_null_stats(stats):
    # empty text → trim→'' → split gives [''] (1 empty token, len 0)
    assert stats[4]["mean_word_len_stat"] == 0.0 or stats[4]["mean_word_len_stat"] is None

"""Distributed LM trainer gates: bit-equality with a driver-side reference
fit on the same corpus, repartition invariance, within-doc-only bigrams,
artifact compatibility with the perplexity scorer's loader schema, and the
vocabulary truncation contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from wikidataquality_spark.operators.lm_trainer import (
    KIND_BI,
    KIND_UNI,
    fit_interpolated_bigram,
    ngram_count_rows,
    train_lm_distributed,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .cache()
    )


def _reference_counts(docs):
    """Driver-side pandas reference: the SAME tokenize + within-doc
    adjacency rule, independent code path."""
    from collections import Counter

    from wikidataquality_spark.operators.tokenize import tokenize

    texts = pd.Series([r["text"] for r in docs.select("text").collect()], dtype=object)
    tok = tokenize(texts)
    w = tok.exploded.to_numpy()
    codes = tok.codes
    uni = Counter(w[~pd.isna(w)])
    bi = Counter()
    if len(w) > 1:
        ok = (codes[1:] == codes[:-1]) & ~pd.isna(w[1:]) & ~pd.isna(w[:-1])
        bi.update(zip(w[:-1][ok], w[1:][ok]))
    return dict(uni), dict(bi)


def test_distributed_counts_exact(spark, docs):
    uni_ref, bi_ref = _reference_counts(docs)
    rows = ngram_count_rows(docs).collect()
    uni = {r["w1"]: r["c"] for r in rows if r["kind"] == KIND_UNI}
    bi = {(r["w1"], r["w2"]): r["c"] for r in rows if r["kind"] == KIND_BI}
    assert uni == uni_ref
    assert bi == bi_ref


def test_distributed_fit_bit_equal_and_repartition_invariant(spark, docs):
    uni_ref, bi_ref = _reference_counts(docs)
    want = fit_interpolated_bigram(uni_ref, bi_ref, vocab_size=500)
    got = train_lm_distributed(docs, vocab_size=500)
    got7 = train_lm_distributed(docs.repartition(7), vocab_size=500)
    for art in (got, got7):
        assert art["vocab"].tolist() == want["vocab"].tolist()
        assert np.array_equal(art["uni_logp"], want["uni_logp"])  # bit-exact
        assert np.array_equal(art["bigram_keys"], want["bigram_keys"])
        assert np.array_equal(art["bigram_cond"], want["bigram_cond"])
        assert art["truncated_bigrams"] is False


def test_no_cross_doc_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    rows = ngram_count_rows(docs).collect()
    bi = {(r["w1"], r["w2"]) for r in rows if r["kind"] == KIND_BI}
    assert bi == {("alpha", "beta"), ("gamma", "delta")}  # no beta→gamma


def test_artifact_loads_into_scorer_schema(spark, docs, tmp_path):
    """The distributed artifact round-trips through npz into the exact
    field set _BigramLM reads — schema compatibility, not score parity
    (the frozen production artifact stays untouched)."""
    art = train_lm_distributed(docs, vocab_size=300)
    p = tmp_path / "lm_test.npz"
    np.savez_compressed(
        p,
        vocab=art["vocab"],
        uni_logp=art["uni_logp"],
        bigram_keys=art["bigram_keys"],
        bigram_cond=art["bigram_cond"],
        lam=art["lam"],
    )
    z = np.load(p, allow_pickle=True)
    vocab_ix = pd.Index(z["vocab"].tolist())
    V = len(vocab_ix)
    assert len(z["uni_logp"]) == V + 1
    assert np.all(np.diff(z["bigram_keys"]) > 0)  # sorted, unique
    assert np.all(z["bigram_cond"] > 0) and np.all(z["bigram_cond"] <= 1.0)
    # interpolated probability is a proper distribution for a seen w1:
    # sum_w2 p(w2|w1) over vocab+unk ≈ lam·sum(cond rows of w1 CAPPED by
    # coverage) + (1-lam)·sum(uni) — spot-check p stays in (0,1]
    lam = float(z["lam"][0])
    p_uni = np.exp(z["uni_logp"])
    some_key = int(z["bigram_keys"][0])
    w1 = some_key // (V + 1)
    mask = (z["bigram_keys"] // (V + 1)) == w1
    total = lam * z["bigram_cond"][mask].sum() + (1 - lam) * p_uni.sum()
    assert 0.0 < total <= 1.0 + 1e-9


def test_vocab_tie_break_deterministic():
    uni = {"b": 5, "a": 5, "c": 3, "d": 1}
    art = fit_interpolated_bigram(uni, {}, vocab_size=2)
    assert art["vocab"].tolist() == ["a", "b"]  # count desc, word asc


def test_bigram_truncation_reported(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a c a d a e " * 3)], "doc_id long, text string"
    )
    art = train_lm_distributed(docs, vocab_size=10, max_bigrams=2)
    assert art["truncated_bigrams"] is True
    assert len(art["bigram_keys"]) <= 2

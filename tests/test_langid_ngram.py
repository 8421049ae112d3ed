"""Char-n-gram language ID: held-out accuracy, junk class, Spark UDF path."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.datagen import generate_pages_with_meta
from wikidataquality_spark.operators.extract import extract_text_series
from wikidataquality_spark.operators.langid_ngram import _NgramLangId, ngram_langid


@pytest.fixture(scope="module")
def held_out():
    pdf = generate_pages_with_meta(2000, seed=777)  # training used seed 1234
    pdf["text_x"] = extract_text_series(pdf["html"])
    return pdf


def test_held_out_accuracy(held_out):
    m = _NgramLangId()
    out = m.predict(held_out["text_x"])
    clean = held_out["defect"].eq("none")
    acc = (out["lang_pred"][clean] == held_out["true_lang"][clean]).mean()
    assert acc >= 0.98


def test_junk_maps_to_und(held_out):
    m = _NgramLangId()
    out = m.predict(held_out["text_x"])
    gib = held_out["defect"].eq("gibberish")
    assert (out["lang_pred"][gib] == "und").mean() >= 0.95


def test_empty_and_null(held_out):
    m = _NgramLangId()
    out = m.predict(pd.Series([None, "", "hello world this is english text"]))
    assert out["lang_pred"].tolist()[0] is None
    assert out["lang_pred"].tolist()[1] is None or out["lang_pred"].tolist()[1] == "und"


def test_spark_udf_path(spark, sf0001_dir):
    """UDF plumbing: model loads on workers, predicts for every non-null doc.
    (documents.parquet text is English-ish DB words under ARBITRARY lang
    labels, so the assertion is consistency, not label agreement: the model
    should call the uniform corpus overwhelmingly one thing.)"""
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    res = ngram_langid("text")
    out = docs.select(
        res["lang_pred"].alias("pred"), res["lang_conf"].alias("conf")
    ).collect()
    preds = [r["pred"] for r in out if r["pred"] is not None]
    assert len(preds) == len(out)
    # out-of-domain corpus: predictions should concentrate on en/und (the
    # text is english-ish jargon) with LOW confidence — not a confident
    # wrong language
    en_und = sum(p in ("en", "und") for p in preds) / len(preds)
    assert en_und >= 0.7
    mean_conf = sum(r["conf"] for r in out) / len(out)
    assert mean_conf < 0.5


def test_trainer_uses_serving_featurizer():
    """train/serve featurizer parity by construction: the trainer's
    trigram_hashes IS the serving one at the trainer's bucket count
    (r04 review: a verbatim copy could drift on hash constants/padding)."""
    import sys

    import numpy as np

    # tools dir is on sys.path via conftest
    import train_langid

    from wikidataquality_spark.operators.langid_ngram import trigram_hashes

    for t in ("hello world", "ü ünïcode", "ab"):
        got = train_langid.trigram_hashes(t)
        want = trigram_hashes(t, np.uint64(train_langid.N_BUCKETS - 1))
        assert np.array_equal(got, want)

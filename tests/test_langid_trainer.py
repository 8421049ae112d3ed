"""Distributed langid trainer gates: bit-equality with a driver-side
reference fit (same serving featurizer), repartition invariance, NULL
exclusion, and loader-schema round-trip."""

from __future__ import annotations

import numpy as np
import pytest

from wikidataquality_spark.operators.langid_trainer import (
    KIND_BUCKET,
    KIND_DOCS,
    fit_langid,
    langid_count_rows,
    train_langid_distributed,
)

NB = 1 << 12  # small bucket space keeps the test fast; algebra is identical


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "text")
        .limit(200)
        .cache()
    )


def _reference(docs):
    from wikidataquality_spark.operators.langid_ngram import trigram_hashes

    mask = np.uint64(NB - 1)
    bucket: dict = {}
    dc: dict = {}
    for r in docs.collect():
        t, lab = r["text"], r["lang"]
        if not isinstance(t, str) or not t or not isinstance(lab, str):
            continue
        dc[lab] = dc.get(lab, 0) + 1
        for b, c in zip(*np.unique(trigram_hashes(t, mask), return_counts=True)):
            bucket[(lab, int(b))] = bucket.get((lab, int(b)), 0) + int(c)
    return bucket, dc


def test_counts_exact_and_fit_bit_equal(spark, docs):
    bucket_ref, dc_ref = _reference(docs)
    rows = langid_count_rows(docs, n_buckets=NB).collect()
    bucket = {
        (r["label"], r["bucket"]): r["c"] for r in rows if r["kind"] == KIND_BUCKET
    }
    dc = {r["label"]: r["c"] for r in rows if r["kind"] == KIND_DOCS}
    assert bucket == bucket_ref and dc == dc_ref

    want = fit_langid(bucket_ref, dc_ref, n_buckets=NB)
    got = train_langid_distributed(docs, n_buckets=NB)
    got7 = train_langid_distributed(docs.repartition(7), n_buckets=NB)
    for art in (got, got7):
        assert art["langs"].tolist() == want["langs"].tolist()
        assert np.array_equal(art["logp"], want["logp"])  # bit-exact f32
        assert np.array_equal(art["prior"], want["prior"])


def test_null_rows_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "en", "hello world text"), (2, None, "dropped"), (3, "fr", None)],
        "doc_id long, lang string, text string",
    )
    art = train_langid_distributed(docs, n_buckets=NB)
    assert art["langs"].tolist() == ["en"]


def test_loader_schema_round_trip(spark, docs, tmp_path):
    art = train_langid_distributed(docs, n_buckets=NB)
    p = tmp_path / "langid_test.npz"
    np.savez_compressed(p, **art)
    z = np.load(p, allow_pickle=True)
    assert set(z.files) >= {"langs", "logp", "prior", "n_buckets"}
    assert z["logp"].shape == (NB, len(z["langs"]))
    assert z["logp"].dtype == np.float32
    # columns are proper log-distributions
    assert np.allclose(np.exp(z["logp"].astype(np.float64)).sum(axis=0), 1.0, atol=1e-3)

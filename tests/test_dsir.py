"""DSIR importance resampling: mirror parity of the literal-array fold,
target-slice enrichment of the trained artifact, Gumbel top-k determinism /
repartition invariance / mirror agreement, and NULL semantics."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.dsir import (
    dsir_gumbel_topk,
    gram_buckets,
    gumbel_key_col,
    load_dsir_model,
    with_dsir_logweight,
)

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF001, "documents.parquet"))


@pytest.fixture(scope="module")
def art():
    return load_dsir_model()


def test_logweight_matches_python_mirror(spark, docs, art):
    """Same buckets (Spark-computed — xxhash64 has no Python twin), same
    left-fold order, same repr-round-tripped literals ⇒ the fold replays."""
    sample = docs.filter(F.col("text").isNotNull()).limit(20)
    got = (
        with_dsir_logweight(sample)
        .select(
            "doc_id",
            "dsir_logweight",
            gram_buckets(F.col("text"), art["n_buckets"]).alias("_b"),
        )
        .collect()
    )
    assert got, "fixture sample empty"
    lr = art["logratio"]
    for r in got:
        mirror = 0.0
        for b in r["_b"]:
            assert 0 <= b < art["n_buckets"]
            mirror = mirror + lr[b]
        assert abs(r["dsir_logweight"] - mirror) < 1e-9


def test_bucket_features_unigram_plus_bigram(spark, art):
    df = spark.createDataFrame(
        [("one two three",), ("one",), ("",), (None,)], "text string"
    )
    got = df.select(gram_buckets(F.col("text"), 64).alias("b")).collect()
    assert len(got[0]["b"]) == 3 + 2  # 3 unigrams + 2 bigrams
    assert len(got[1]["b"]) == 1  # lone word: no bigram
    assert got[2]["b"] == []  # empty text: no grams, score 0 (neutral)
    assert got[3]["b"] is None  # NULL text: no evidence


def test_trained_artifact_enriches_target_slice(spark, docs, art):
    """The artifact was trained toward source ∈ src1-3: that slice must
    out-score the rest on average (the whole point of the log-ratio)."""
    scored = with_dsir_logweight(docs.filter(F.col("text").isNotNull()))
    rows = (
        scored.groupBy(F.col("source").isin("src1", "src2", "src3").alias("t"))
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    )
    m = {r["t"]: r["m"] for r in rows}
    assert m[True] > m[False]


def test_gumbel_topk_deterministic_and_mirror(spark, docs, art):
    k = 40
    a = dsir_gumbel_topk(docs, k, seed=7)
    b = dsir_gumbel_topk(docs.repartition(17), k, seed=7)
    ra, rb = a.collect(), b.collect()
    assert [r["doc_id"] for r in ra] == [r["doc_id"] for r in rb]
    assert len(ra) == k

    # mirror: top-k of the full scored table, computed driver-side
    full = (
        docs.select(
            "doc_id",
            F.col("text").isNotNull().alias("_t"),
        )
        .join(with_dsir_logweight(docs).select("doc_id", "dsir_logweight"), "doc_id")
        .filter(F.col("_t") & F.col("doc_id").isNotNull())
        .select("doc_id", "dsir_logweight")
        .join(
            docs.select("doc_id", gumbel_key_col(F.col("doc_id"), 7).alias("_g")),
            "doc_id",
        )
        .collect()
    )
    mirror = sorted(
        ((r["dsir_logweight"] + r["_g"], -r["doc_id"]) for r in full), reverse=True
    )[:k]
    got_keys = [r["gumbel_key"] for r in ra]
    for (mk, _), gk in zip(mirror, got_keys):
        assert abs(mk - gk) < 1e-9


def test_gumbel_seed_redraws(spark, docs):
    s7 = {r["doc_id"] for r in dsir_gumbel_topk(docs, 50, seed=7).collect()}
    s8 = {r["doc_id"] for r in dsir_gumbel_topk(docs, 50, seed=8).collect()}
    assert s7 != s8  # a redraw that never moves is a broken hash


def test_gumbel_uniform_in_open_interval(spark):
    """u strictly inside (0,1): the half-offset means -ln(-ln u) is always
    finite, even for the hash values 0 and 2^53-1."""
    df = spark.range(10_000)
    got = df.select(gumbel_key_col(F.col("id"), 3).alias("g")).agg(
        F.min("g"), F.max("g"), F.count(F.when(F.isnan("g") | F.col("g").isNull(), 1))
    ).collect()[0]
    assert got[2] == 0
    assert math.isfinite(got[0]) and math.isfinite(got[1])


def test_artifact_validation(tmp_path):
    import json

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"n_buckets": 8, "logratio": [0.0] * 4}))
    with pytest.raises(ValueError):
        load_dsir_model(str(bad))
    with pytest.raises(ValueError):
        dsir_gumbel_topk(None, 0)


def test_scorer_plan_zero_shuffle_zero_python(spark, docs, art):
    """The 100 TB contract: scoring is ONE codegen'd projection — the
    physical plan may contain no Exchange, no Python eval node, no Join."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with_dsir_logweight(docs).explain("formatted")
    plan = buf.getvalue()
    for node in ("Exchange", "ArrowEvalPython", "BatchEvalPython", "Join"):
        assert node not in plan, plan

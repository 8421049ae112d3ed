"""Model-based quality scorer: DuckDB-twin exact parity on the linear logit
and the class labels, sigmoid sanity, NULL/empty-text imputation, plan shape
(zero Python, no shuffle), and distillation fidelity vs the golden labels."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.heuristics import STOPWORDS
from wikidataquality_spark.operators.quality_model import (
    QUALITY_FEATURES,
    load_quality_model,
    quality_class_sql,
    quality_logit_sql,
    with_quality_score,
)

STOPWORD_SQL = ",".join(f"'{s}'" for s in STOPWORDS)


@pytest.fixture(scope="module")
def art():
    return load_quality_model()


def test_artifact_contract(art):
    assert tuple(art["features"]) == QUALITY_FEATURES
    for key in ("mu", "sd", "w"):
        assert len(art[key]) == len(QUALITY_FEATURES)
    assert all(s > 0 for s in art["sd"])
    lo, hi = art["class_logits"]
    assert lo < hi


def test_logit_and_class_match_duckdb_twin(spark, sf001_dir, art):
    """Logit parity on the full sf0.01 documents table. Every feature value
    is bit-identical cross-engine (verified term-by-term when this gate was
    built); the weighted fold itself differs by ±1 ulp because DuckDB fuses
    the multiply-adds (FMA rounds once where separate *,+ round twice) — so
    the raw logit is pinned at 1e-12 ABSOLUTE and the class labels exactly.
    The driver oracle gates ROUND(logit, 6), the house double convention."""
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    got = (
        with_quality_score(docs, art=art)
        .select("doc_id", "quality_logit", "quality_class")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    logit = quality_logit_sql("text", STOPWORD_SQL, art)
    want = con.execute(
        f"""
        SELECT doc_id, {logit} AS quality_logit,
               {quality_class_sql(logit, art)} AS quality_class
        FROM read_parquet('{sf001_dir}/documents.parquet')
        ORDER BY doc_id
        """
    ).df()
    assert list(got["quality_class"]) == list(want["quality_class"])
    pd.testing.assert_series_equal(
        got["quality_logit"], want["quality_logit"], atol=1e-12, rtol=0.0
    )


def test_sigmoid_score_matches_logit(spark, art):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog in a field of green")],
        "doc_id long, text string",
    )
    row = with_quality_score(df, art=art).collect()[0]
    assert row["quality_score"] == pytest.approx(
        1.0 / (1.0 + math.exp(-row["quality_logit"])), abs=1e-12
    )
    assert 0.0 < row["quality_score"] < 1.0


def test_null_and_empty_text_impute_to_neutral(spark, art):
    """NULL text ⇒ every feature NULL ⇒ all impute to mu ⇒ logit == bias.
    Empty text ⇒ ratios NULL but counts 0 ⇒ still finite, never NULL."""
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in with_quality_score(df, art=art).collect()}
    assert out[1]["quality_logit"] == pytest.approx(art["bias"], abs=1e-12)
    assert out[2]["quality_logit"] is not None
    assert out[2]["quality_class"] in ("low", "medium", "high")


def test_scorer_plan_is_pure_projection(spark, sf001_dir, art):
    """One codegen'd projection: no Python stage, no Exchange — the scorer
    must ride an existing scan for free at 100 TB."""
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = (
        with_quality_score(docs, art=art)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_distillation_fidelity_vs_golden_labels(spark, art):
    """Recomputed live (not the frozen train_metrics): scoring the golden
    fixture corpus must reproduce the rule DAG's keep decision at F1 ≥ 0.9
    with recall ≥ 0.98 — the pre-filter contract is 'drop confidently bad
    docs early, almost never drop a keeper'."""
    from wikidataquality_spark.datagen import fixture_pages_path
    from wikidataquality_spark.operators.extract import extracted_text

    golden = os.path.join(
        os.path.dirname(__file__), "fixtures", "golden_labels.parquet"
    )
    pages = spark.read.parquet(fixture_pages_path(800, 42))
    scored = with_quality_score(
        pages.select("url", extracted_text("html").alias("text")), art=art
    ).select("url", (F.col("quality_logit") > 0).alias("pred"))
    pdf = scored.toPandas().merge(
        pd.read_parquet(golden)[["url", "keep"]], on="url", how="inner"
    )
    assert len(pdf) == 800
    tp = int(((pdf.pred) & (pdf.keep)).sum())
    fp = int(((pdf.pred) & (~pdf.keep)).sum())
    fn = int(((~pdf.pred) & (pdf.keep)).sum())
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    f1 = 2 * prec * rec / (prec + rec)
    assert f1 >= 0.90, (prec, rec, f1)
    assert rec >= 0.98, (prec, rec, f1)

"""Train + freeze the linear quality-classifier artifact (distillation).

Target labels are the frozen rule DAG's keep/drop decisions on the golden
fixture corpus (tests/fixtures/golden_labels.parquet — the same annotator
provenance documented in tools/make_goldens.py); inputs are the nine
pure-SQL document statistics from operators/quality_model.py computed over
the SAME extracted text the pipeline validated. Full-batch logistic
regression in float64 numpy — deterministic: fixed feature order, zero
init, fixed step count, no RNG anywhere.

Usage: python tools/train_quality.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, "tests", "fixtures", "golden_labels.parquet")
ITERS = 2000
LR = 0.5
L2 = 1e-3  # small ridge: keeps weights finite when a feature separates


def main() -> None:
    import pandas as pd

    from wikidataquality_spark.datagen import fixture_pages_path
    from wikidataquality_spark.operators.extract import extracted_text
    from wikidataquality_spark.operators.quality_model import (
        QUALITY_FEATURES,
        QUALITY_LR_V1,
        feature_cols,
    )
    from wikidataquality_spark.session import get_spark

    spark = get_spark(app_name="train_quality")
    pages = spark.read.parquet(fixture_pages_path(800, 42))
    text = extracted_text("html")
    feats = feature_cols(text)
    pdf = (
        pages.select(
            "url", *[feats[n].cast("double").alias(n) for n in QUALITY_FEATURES]
        )
        .toPandas()
        .merge(pd.read_parquet(GOLDEN)[["url", "keep"]], on="url", how="inner")
    )
    X_raw = pdf[list(QUALITY_FEATURES)].to_numpy(dtype=np.float64)
    y = pdf["keep"].to_numpy(dtype=np.float64)

    # Standardize with mean-imputation of NULL stats (empty/NULL text):
    # mu over observed values only, then NaN -> mu, i.e. 0 after scaling.
    mu = np.nanmean(X_raw, axis=0)
    sd = np.nanstd(X_raw, axis=0)
    sd = np.where(sd < 1e-9, 1.0, sd)  # constant feature -> weightless
    X = (np.where(np.isnan(X_raw), mu, X_raw) - mu) / sd

    n = len(y)
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g_w = X.T @ (p - y) / n + L2 * w
        g_b = float(np.mean(p - y))
        w -= LR * g_w
        b -= LR * g_b

    pred = (X @ w + b) > 0.0
    tp = float(np.sum(pred & (y == 1)))
    fp = float(np.sum(pred & (y == 0)))
    fn = float(np.sum(~pred & (y == 1)))
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    acc = float(np.mean(pred == (y == 1)))
    print(f"train n={n} acc={acc:.4f} precision={prec:.4f} recall={rec:.4f} f1={f1:.4f}")

    art = {
        "version": "v1",
        "trainer": "train_quality.py",
        "label_source": "tests/fixtures/golden_labels.parquet (rule-DAG keep)",
        "train_corpus": "fixture_pages(800, seed=42)",
        "iters": ITERS,
        "lr": LR,
        "l2": L2,
        "features": list(QUALITY_FEATURES),
        "mu": [float(v) for v in mu],
        "sd": [float(v) for v in sd],
        "w": [float(v) for v in w],
        "bias": float(b),
        # class cut points on the LOGIT axis (score 0.25 / 0.75): exact
        # comparisons on the exact linear score, no transcendentals in the gate
        "class_logits": [-1.0986122886681098, 1.0986122886681098],
        "train_metrics": {"n": n, "acc": acc, "precision": prec, "recall": rec, "f1": f1},
    }
    staging = QUALITY_LR_V1 + f".staging.{os.getpid()}"
    with open(staging, "w") as f:
        json.dump(art, f, indent=1)
    os.replace(staging, QUALITY_LR_V1)
    print(f"frozen: {QUALITY_LR_V1}")


if __name__ == "__main__":
    main()

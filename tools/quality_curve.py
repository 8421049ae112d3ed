"""Precision/recall curve of the model-based quality filter vs goldens.

Companion evidence to the recall tools (ivf/pq/minhash) for the learned
filter (operators/quality_model.py): sweep the keep threshold over the
logit and report precision/recall/F1 at each point against the frozen
golden keep/drop labels — the curve a team uses to PICK an operating point
(high-recall pre-filter vs high-precision final filter), where the single
default-threshold F1 (gated in tests/test_quality_model.py) only certifies
one point.

Same corpus/text provenance as tools/train_quality.py (the 800-page golden
fixture, extracted text) — this measures generalization of the distilled
scorer to its own training distribution, honestly labeled as such: the
sandbox has no held-out web corpus by contract. Deterministic, driver-side
numpy over 800 rows.

Prints one JSON line; with --write saves tools/quality_curve.json, which
tools/plan_audit.py renders into PLANS.md on its next run.

Usage: python tools/quality_curve.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, "tests", "fixtures", "golden_labels.parquet")


def main() -> int:
    write = "--write" in sys.argv
    import pandas as pd
    from pyspark.sql import functions as F

    from wikidataquality_spark.datagen import fixture_pages_path
    from wikidataquality_spark.operators.extract import extracted_text
    from wikidataquality_spark.operators.quality_model import (
        load_quality_model,
        quality_logit_col,
    )
    from wikidataquality_spark.session import get_spark

    spark = get_spark(cpus=8, app_name="quality_curve")
    art = load_quality_model()
    pages = spark.read.parquet(fixture_pages_path(800, 42))
    scored = pages.select(
        "url", quality_logit_col(extracted_text("html"), art).alias("logit")
    ).toPandas()
    golden = pd.read_parquet(GOLDEN)[["url", "keep"]]
    m = scored.merge(golden, on="url", how="inner")
    assert len(m) == len(golden), (len(m), len(golden))
    logit = m["logit"].fillna(-np.inf).to_numpy()
    y = m["keep"].to_numpy(dtype=bool)

    points = []
    for thr in np.quantile(logit[np.isfinite(logit)], np.linspace(0.02, 0.98, 25)):
        pred = logit >= thr
        tp = int((pred & y).sum())
        fp = int((pred & ~y).sum())
        fn = int((~pred & y).sum())
        prec = tp / (tp + fp) if tp + fp else 1.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        points.append(
            {
                "thr": round(float(thr), 4),
                "precision": round(prec, 4),
                "recall": round(rec, 4),
                "f1": round(f1, 4),
            }
        )
    best = max(points, key=lambda p: p["f1"])
    # the operating point the artifact actually ships (class_logits[0] is
    # the low/medium boundary the pipeline's pre-filter drops below)
    lo = float(art["class_logits"][0])
    pred = logit >= lo
    tp = int((pred & y).sum())
    fp = int((pred & ~y).sum())
    fn = int((~pred & y).sum())
    shipped = {
        "thr": round(lo, 4),
        "precision": round(tp / (tp + fp), 4) if tp + fp else 1.0,
        "recall": round(tp / (tp + fn), 4) if tp + fn else 0.0,
    }
    out = {
        "metric": "quality_filter_pr_curve",
        "n_docs": int(len(m)),
        "positive_rate": round(float(y.mean()), 4),
        "best_f1": best,
        "shipped_low_threshold": shipped,
        "curve": points,
    }
    print(json.dumps(out))
    if write:
        with open(os.path.join(REPO, "tools", "quality_curve.json"), "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

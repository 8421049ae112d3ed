"""Train + freeze the DSIR bucket log-ratio artifact (models/dsir_v1.json).

Target distribution p̂: the "curated slice" of the documents fixture —
sources src1-src3 stand in for the hand-curated reference corpus DSIR
steers toward (Wikipedia/books in the paper; this sandbox has no external
data by contract, so the slice is the deterministic stand-in and is
recorded in the artifact). Raw distribution q̂: the whole table. Both are
hashed unigram+bigram bucket counts (operators/dsir.gram_buckets — the
exact expression the scorer folds over, so train and serve share one
feature definition and cannot skew).

Laplace smoothing α on BOTH models keeps every bucket's ratio finite:
log p̂_b − log q̂_b with p̂_b = (c_b + α)/(N + αB). Deterministic end to
end — counts are exact aggregates, no RNG anywhere.

Usage: python tools/train_dsir.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF001 = "/root/testdata/sf0.01"
N_BUCKETS = 8192
ALPHA = 0.5
TARGET_SOURCES = ("src1", "src2", "src3")


def bucket_counts(df, text_col: str, n_buckets: int):
    """length-B numpy count vector: explode → B-bounded groupBy — the
    aggregation state is ≤ B rows per partition at any corpus size."""
    import numpy as np
    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.dsir import gram_buckets

    rows = (
        df.select(F.explode(gram_buckets(F.col(text_col), n_buckets)).alias("_b"))
        .groupBy("_b")
        .agg(F.count("*").alias("_c"))
        .collect()
    )
    c = np.zeros(n_buckets, dtype=np.float64)
    for r in rows:
        c[r["_b"]] = r["_c"]
    return c


def main() -> None:
    import math

    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.dsir import DSIR_V1
    from wikidataquality_spark.session import get_spark

    spark = get_spark(app_name="train_dsir")
    docs = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    target = docs.filter(F.col("source").isin(*TARGET_SOURCES))

    cp = bucket_counts(target, "text", N_BUCKETS)
    cq = bucket_counts(docs, "text", N_BUCKETS)
    np_, nq = float(cp.sum()), float(cq.sum())
    denom_p = math.log(np_ + ALPHA * N_BUCKETS)
    denom_q = math.log(nq + ALPHA * N_BUCKETS)
    lr = [
        (math.log(cp[b] + ALPHA) - denom_p) - (math.log(cq[b] + ALPHA) - denom_q)
        for b in range(N_BUCKETS)
    ]

    art = {
        "version": 1,
        "n_buckets": N_BUCKETS,
        "alpha": ALPHA,
        "target": f"documents.source IN {TARGET_SOURCES} at {SF001}",
        "n_target_grams": int(np_),
        "n_raw_grams": int(nq),
        "logratio": lr,
    }
    with open(DSIR_V1, "w") as f:
        json.dump(art, f)
    print(f"wrote {DSIR_V1}: B={N_BUCKETS}, target grams={int(np_)}, raw grams={int(nq)}")


if __name__ == "__main__":
    main()

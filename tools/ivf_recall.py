"""Measure IVF ANN recall vs exact brute force on the sf0.1 embeddings.

r03 VERDICT #2 done-criterion: with trained k-means centroids (not the old
lowest-id stand-in), document recall@k for production probe settings
(n_probe < n_lists). Prints one JSON line; with --write it saves
tools/ivf_recall.json, which tools/plan_audit.py renders into PLANS.md on
its next run (PLANS.md is a full overwrite — appending here would
duplicate the block).

Usage: python tools/ivf_recall.py [sf_dir] [--write]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from wikidataquality_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv
    # single source for the default corpus location (r04 review: three
    # hardcoded copies of this env default could drift)
    from wikidataquality_spark.tables import DEFAULT_SF_DIR

    sf_dir = args[0] if args else DEFAULT_SF_DIR

    from wikidataquality_spark.operators.simsearch import (
        brute_force_topk,
        ivf_topk,
        train_centroids,
        train_centroids_distributed,
    )

    spark = get_spark(cpus=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    k = 10
    exact = set(
        map(
            tuple,
            brute_force_topk(emb, queries, k=k)
            .select("q_id", "vec_id")
            .toPandas()
            .values.tolist(),
        )
    )

    results = {}
    # train once per n_lists, not per (n_lists, n_probe): train_centroids is
    # deterministic for fixed corpus+seed, so per-probe retraining paid the
    # corpus sample + k-means 5x for 2 distinct banks (r04 review)
    banks = {nl: train_centroids(emb, n_lists=nl) for nl in (8, 16)}
    # the full-corpus trainer (one suffix-D config): quantifies what Lloyd
    # over ALL vectors buys vs the 2048-row driver sample
    banks["8D"] = train_centroids_distributed(emb, n_lists=8, iters=8)
    for n_lists, n_probe, bank in [
        (8, 1, 8),
        (8, 2, 8),
        (8, 4, 8),
        (16, 2, 16),
        (16, 4, 16),
        (8, 2, "8D"),
        (8, 4, "8D"),
    ]:
        cents = banks[bank]
        approx = set(
            map(
                tuple,
                ivf_topk(
                    emb, queries, k=k, n_lists=n_lists, n_probe=n_probe, centroids=cents
                )
                .select("q_id", "vec_id")
                .toPandas()
                .values.tolist(),
            )
        )
        label = f"lists{n_lists}_probe{n_probe}" + (
            "_distributed" if bank == "8D" else ""
        )
        results[label] = round(len(approx & exact) / len(exact), 4)

    out = {"metric": "ivf_recall_at_10", "n_vectors": n, "sf_dir": sf_dir, **results}
    print(json.dumps(out))
    if write:
        # persisted for plan_audit.py, which renders the block each time it
        # regenerates PLANS.md (a full overwrite — appending here would
        # duplicate the block)
        with open(os.path.join(REPO, "tools", "ivf_recall.json"), "w") as f:
            json.dump(out, f, indent=2)
        print("saved tools/ivf_recall.json — run tools/plan_audit.py to render")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

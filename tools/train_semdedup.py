"""Train + freeze the SemDeDup cluster-centroid artifact.

Runs the deterministic sampled spherical k-means from
operators/simsearch.py (train_centroids — seed 13, hash-lowest sample, the
same trainer the IVF index uses) over the sf0.01 embeddings table and
freezes the centroid bank as a versioned JSON artifact next to the other
model files. SemDeDup's cluster geometry is a train-once index artifact:
every query run (any SF) and the DuckDB oracle load the SAME constants, so
assignment and survivor selection are replayable bit-for-bit — the
production shape, where the k-means index lives beside the table snapshot
and corpus passes never retrain.

JSON doubles round-trip exactly (repr precision), so Spark's F.lit()
literals and the oracle's E-notation literals decode to identical IEEE
values.

Usage: python tools/train_semdedup.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_SF_DIR = "/root/testdata/sf0.01"
N_LISTS = 8
DIM = 64
SEED = 13
SAMPLE_N = 2048  # recorded explicitly: every train_centroids parameter that
ITERS = 8  # changes the output geometry must be pinned in the artifact


def main() -> None:
    from wikidataquality_spark.operators.semdedup import SEMDEDUP_CENTROIDS_V1
    from wikidataquality_spark.operators.simsearch import train_centroids
    from wikidataquality_spark.session import get_spark

    spark = get_spark(app_name="train_semdedup")
    emb = spark.read.parquet(os.path.join(TRAIN_SF_DIR, "embeddings.parquet"))
    cents = train_centroids(
        emb, n_lists=N_LISTS, dim=DIM, sample_n=SAMPLE_N, iters=ITERS, seed=SEED
    )
    art = {
        "version": "v1",
        "trainer": "train_centroids",
        "train_sf_dir": TRAIN_SF_DIR,
        "n_lists": N_LISTS,
        "dim": DIM,
        "sample_n": SAMPLE_N,
        "iters": ITERS,
        "seed": SEED,
        "centroids": cents,
    }
    staging = SEMDEDUP_CENTROIDS_V1 + f".staging.{os.getpid()}"
    with open(staging, "w") as f:
        json.dump(art, f)
    os.replace(staging, SEMDEDUP_CENTROIDS_V1)
    print(f"wrote {SEMDEDUP_CENTROIDS_V1} ({N_LISTS} centroids, dim {DIM})")
    spark.stop()


if __name__ == "__main__":
    main()

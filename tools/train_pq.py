"""Train + freeze the PQ codebook artifact (train-once, versioned).

Per-subspace Euclidean k-means (operators/pq.train_pq_codebooks — k-means++
init + Lloyd, seeded, float64) over the sf0.01 embeddings table, rows in
vec_id order so the sample is deterministic. m=8 subspaces × k=16 centroids
over dim=64: a code is 8 small ints (4 bits each packed — 4 bytes vs 256
bytes of float32, 64×). JSON doubles round-trip at repr precision, so Spark
and the DuckDB twin decode identical IEEE values.

Usage: python tools/train_pq.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_SF_DIR = "/root/testdata/sf0.01"
DIM = 64
M = 8
K = 16
ITERS = 12
SEED = 13


def main() -> None:
    import pyarrow.parquet as pq_

    from wikidataquality_spark.operators.pq import PQ_CODEBOOKS_V1, train_pq_codebooks

    tbl = (
        pq_.read_table(os.path.join(TRAIN_SF_DIR, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
    )
    vecs = np.stack(
        [v for v in tbl["embedding"] if v is not None and len(v) == DIM]
    ).astype(np.float64)
    cb = train_pq_codebooks(vecs, m=M, k=K, iters=ITERS, seed=SEED)
    art = {
        "version": "v1",
        "trainer": "train_pq.py",
        "train_sf_dir": TRAIN_SF_DIR,
        "dim": DIM,
        "m": M,
        "k": K,
        "iters": ITERS,
        "seed": SEED,
        "n_train": int(len(vecs)),
        "codebooks": cb,
    }
    staging = PQ_CODEBOOKS_V1 + f".staging.{os.getpid()}"
    with open(staging, "w") as f:
        json.dump(art, f)
    os.replace(staging, PQ_CODEBOOKS_V1)
    print(f"frozen: {PQ_CODEBOOKS_V1} (n_train={len(vecs)})")


if __name__ == "__main__":
    main()

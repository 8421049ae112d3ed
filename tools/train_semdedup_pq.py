"""Train + freeze the SemDeDup verify-stage PQ codebook artifact.

r04 VERDICT #1: semdedup_marks' within-cell verify was the engine's one
wide shuffle (199 B/row — the raw vectors). The fix composes the PQ
machinery (operators/pq.py) as a pair PRE-filter: cell members carry a
32×4-bit code (two packed longs) through the pair exchange instead of the
64-float vector, pairs are screened by a symmetric-ADC dot estimate, and
only the surviving shortlist is exact-verified against re-fetched vectors.

This trains the codebook that screening runs on: per-subspace Euclidean
k-means (train_pq_codebooks — deterministic k-means++/Lloyd, seed 13) over
the UNIT-NORMALIZED sf0.01 embeddings. Unit vectors, because the screen
estimates COSINE directly (Σ_j dot(codebook_j[a], codebook_j[b]) over unit
codes needs no norm column in the pair row — 8 bytes narrower). m=32/k=16
was chosen by measurement against m=8 (the pq_codebooks_v1 geometry: err
σ=0.108, screens nothing usable on the near-uniform synthetic corpus) and
m=16 (σ=0.089): at m=32 σ=0.054 and a 0.2 margin under the 0.4 threshold
admits 8.6% of within-cell pairs with ZERO true pairs missed at sf0.01
(PLANS.md §SemDeDup ADC pre-filter records the sweep).

JSON doubles round-trip exactly (repr precision), so Spark literals, the
python-side dot tables, and the oracle's literals are identical IEEE
values.

Usage: python tools/train_semdedup_pq.py
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
M = 32
K = 16
ITERS = 8
SEED = 13


def main() -> None:
    import pyarrow.parquet as pq_

    from wikidataquality_spark.operators.pq import train_pq_codebooks
    from wikidataquality_spark.operators.semdedup import SEMDEDUP_PQ_V1

    emb = pq_.read_table(
        os.path.join(TRAIN_SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).to_pandas()
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(v, axis=1)
    v = v[nrm > 0] / nrm[nrm > 0, None]  # unit sphere — the screen's domain
    cb = train_pq_codebooks(v, m=M, k=K, iters=ITERS, seed=SEED)
    art = {
        "version": "v1",
        "trainer": "train_pq_codebooks",
        "train_sf_dir": TRAIN_SF_DIR,
        "unit_normalized": True,
        "dim": DIM,
        "m": M,
        "k": K,
        "iters": ITERS,
        "seed": SEED,
        "codebooks": cb,
    }
    staging = SEMDEDUP_PQ_V1 + f".staging.{os.getpid()}"
    with open(staging, "w") as f:
        json.dump(art, f)
    os.replace(staging, SEMDEDUP_PQ_V1)
    print(f"frozen: {SEMDEDUP_PQ_V1} (m={M}, k={K}, {len(v)} train vectors)")


if __name__ == "__main__":
    main()

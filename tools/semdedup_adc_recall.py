"""Measure the SemDeDup ADC pre-filter: screen recall + admission rate.

Companion evidence to tools/minhash_recall.py / pq_recall.py for the
narrow-verify rework (r04 VERDICT #1): semdedup_marks' quadratic stage now
carries packed PQ codes (operators/semdedup.py) and screens pairs by the
SDC cosine estimate at threshold − SEMDEDUP_ADC_MARGIN before the exact
verify. This tool replays the shipped artifact's exact algebra driver-side
(same centroid assignment, same pq codes via argmin over the same
codebooks, same dot tables) over every within-cell pair of the sf0.01
corpus, and reports the quantization-error distribution plus a margin
sweep: pairs admitted to exact verify and TRUE pairs (exact cos ≥
threshold) missed — the screen's measured recall.

Prints one JSON line; with --write saves tools/semdedup_adc_recall.json,
which tools/plan_audit.py renders into PLANS.md on its next run.

Usage: python tools/semdedup_adc_recall.py [sf_dir] [--write]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THRESHOLD = 0.4
MARGINS = (0.05, 0.1, 0.15, 0.2, 0.25)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import pyarrow.parquet as pq_

    from wikidataquality_spark.operators.semdedup import (
        SEMDEDUP_ADC_MARGIN,
        load_semdedup_centroids,
        load_semdedup_pq,
        pq_dot_tables,
    )

    emb = pq_.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).to_pandas()
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(V, axis=1)
    keep = nrm > 0
    V, nrm = V[keep], nrm[keep]

    C = np.asarray(load_semdedup_centroids())
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    cells = (V @ C.T / cn[None, :]).argmax(axis=1)

    art = load_semdedup_pq()
    m, k, dim = art["m"], art["k"], art["dim"]
    dsub = dim // m
    cb = np.asarray(art["codebooks"])  # m,k,dsub
    U = V / nrm[:, None]
    codes = np.zeros((len(U), m), dtype=int)
    for j in range(m):
        x = U[:, j * dsub : (j + 1) * dsub]
        d = ((x[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    tabs = np.asarray(pq_dot_tables(art)).reshape(m, k, k)

    pairs = []
    for cell in range(C.shape[0]):
        idx = np.where(cells == cell)[0]
        for i in range(len(idx)):
            for j in range(i + 1, len(idx)):
                pairs.append((idx[i], idx[j]))
    P = np.asarray(pairs)
    tc = np.einsum("ij,ij->i", V[P[:, 0]], V[P[:, 1]]) / (nrm[P[:, 0]] * nrm[P[:, 1]])
    ac = np.zeros(len(P))
    for j in range(m):
        ac += tabs[j, codes[P[:, 0], j], codes[P[:, 1], j]]
    errs = ac - tc
    true_mask = tc >= THRESHOLD
    sweep = {}
    for margin in MARGINS:
        admitted = ac >= THRESHOLD - margin
        sweep[str(margin)] = {
            "admit_rate": round(float(admitted.mean()), 4),
            "missed_true": int((true_mask & ~admitted).sum()),
        }
    out = {
        "metric": "semdedup_adc_screen",
        "sf_dir": sf_dir,
        "n_vectors": int(len(V)),
        "m": m,
        "k": k,
        "threshold": THRESHOLD,
        "shipped_margin": SEMDEDUP_ADC_MARGIN,
        "within_cell_pairs": int(len(P)),
        "true_pairs": int(true_mask.sum()),
        "err_std": round(float(errs.std()), 4),
        "err_min": round(float(errs.min()), 4),
        "err_max": round(float(errs.max()), 4),
        "min_true_pair_estimate": (
            round(float(ac[true_mask].min()), 4) if true_mask.any() else None
        ),
        "margin_sweep": sweep,
    }
    print(json.dumps(out))
    if write:
        with open(os.path.join(REPO, "tools", "semdedup_adc_recall.json"), "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Measure PQ/ADC shortlist recall vs exact brute force (numpy replay).

Companion evidence to tools/ivf_recall.py for the product-quantization
path (operators/pq.py): recall@10 of the ADC shortlist at several
candidate counts, averaged over 20 seeded queries — the final two-stage
scan (pq_adc_rerank_topk) has exactly the shortlist's recall, since the
re-rank is exact. Pure numpy replay of the same frozen artifact the Spark
operator inlines (the encode/ADC algebra is gated bit-for-bit against
DuckDB in tests/test_pq.py; this tool measures QUALITY, not parity).

Prints one JSON line; with --write saves tools/pq_recall.json, which
tools/plan_audit.py renders into PLANS.md on its next run.

Usage: python tools/pq_recall.py [sf_dir] [--write]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANDIDATES = (10, 30, 50, 100)
N_QUERIES = 20
K = 10


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv
    from wikidataquality_spark.tables import DEFAULT_SF_DIR

    sf_dir = args[0] if args else DEFAULT_SF_DIR

    import pyarrow.parquet as pq_

    from wikidataquality_spark.operators.pq import adc_lut, load_pq_codebooks

    art = load_pq_codebooks()
    t = (
        pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
    )
    ok = t["embedding"].map(
        lambda v: v is not None and len(v) == art["dim"]
    )
    t = t[ok]
    vecs = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    m, dim = art["m"], art["dim"]
    dsub = dim // m
    cb = np.asarray(art["codebooks"])
    codes = np.stack(
        [
            ((vecs[:, j * dsub : (j + 1) * dsub][:, None, :] - cb[j][None, :, :]) ** 2)
            .sum(axis=2)
            .argmin(axis=1)
            for j in range(m)
        ],
        axis=1,
    )
    rng = np.random.RandomState(5)
    recalls: dict[int, list[float]] = {c: [] for c in CANDIDATES}
    for _ in range(N_QUERIES):
        q = rng.randn(dim) * 0.15
        lut = np.asarray(adc_lut(list(q), art))
        adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
        exact = set(ids[np.argsort(((vecs - q) ** 2).sum(axis=1))[:K]])
        order = np.argsort(adc)
        for c in CANDIDATES:
            recalls[c].append(len(exact & set(ids[order[:c]])) / K)
    out = {
        "metric": f"pq_shortlist_recall_at_{K}",
        "n_vectors": int(len(ids)),
        "sf_dir": sf_dir,
        "m": m,
        "k": art["k"],
        "n_queries": N_QUERIES,
        **{f"candidates{c}": round(float(np.mean(v)), 3) for c, v in recalls.items()},
    }
    print(json.dumps(out))
    if write:
        with open(os.path.join(REPO, "tools", "pq_recall.json"), "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

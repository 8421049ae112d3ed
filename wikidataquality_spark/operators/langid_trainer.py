"""Distributed language-ID training: hashed-trigram counts at corpus scale.

Completes the trainer set (operators/bpe.py, operators/lm_trainer.py) for
the third model family: the offline tool (tools/train_langid.py) loops the
corpus driver-side; here the counting is the cluster's job and only the
(label, bucket) count table — bounded by n_langs × n_buckets, NEVER by
corpus size — reaches the driver.

  1. **langid_count_rows**: iterator mapInPandas using the SERVING
     featurizer (langid_ngram.trigram_hashes — train and serve share one
     hash, the r04 skew rule), batch-locally combined into per-label
     bincounts before anything crosses Arrow; one groupBy-sum finishes
     exact global counts. Doc totals per label ride the same pass as a
     second `kind` (priors need them).
  2. **fit_langid**: the tool's exact algebra — add-k column-normalized
     log-probs (float64 math, float32 artifact) + log priors. Integer
     counts ⇒ bit-equal to a driver-side reference fit (gated).

The artifact dict matches models/langid_ngram_v1.npz field-for-field, so
operators/langid_ngram.py's loader schema accepts a round-trip.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KIND_BUCKET, KIND_DOCS = 0, 1
COUNT_SCHEMA = "kind int, label string, bucket long, c long"


def langid_count_rows(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
) -> DataFrame:
    """Exact (kind, label, bucket, c): kind 0 = trigram-bucket count, kind 1
    = labeled-doc count (bucket NULL). NULL label/text rows are excluded —
    unlabeled docs cannot train a supervised model."""
    mask = np.uint64(n_buckets - 1)

    def count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wikidataquality_spark.operators.langid_ngram import trigram_hashes

        for pdf in batches:
            acc: dict[str, np.ndarray] = {}
            docs: dict[str, int] = {}
            # columns are renamed to the fixed (label, text) pair before
            # mapInPandas — the closure must read the RENAMED names
            for t, lab in zip(pdf["text"], pdf["label"]):
                if not isinstance(t, str) or not t or not isinstance(lab, str):
                    continue
                docs[lab] = docs.get(lab, 0) + 1
                h = trigram_hashes(t, mask)
                if lab not in acc:
                    acc[lab] = np.zeros(n_buckets, dtype=np.int64)
                acc[lab] += np.bincount(h, minlength=n_buckets)
            out = {"kind": [], "label": [], "bucket": [], "c": []}
            for lab, vec in acc.items():
                nz = np.nonzero(vec)[0]
                out["kind"].extend([KIND_BUCKET] * len(nz))
                out["label"].extend([lab] * len(nz))
                out["bucket"].extend(nz.tolist())
                out["c"].extend(vec[nz].tolist())
            for lab, n in docs.items():
                out["kind"].append(KIND_DOCS)
                out["label"].append(lab)
                out["bucket"].append(None)
                out["c"].append(n)
            yield pd.DataFrame(out)

    return (
        df.select(label_col, text_col)
        .withColumnRenamed(label_col, "label")
        .withColumnRenamed(text_col, "text")
        .mapInPandas(count_batches, COUNT_SCHEMA)
        .groupBy("kind", "label", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def fit_langid(
    bucket_counts: dict[tuple[str, int], int],
    doc_counts: dict[str, int],
    n_buckets: int = 1 << 16,
    add_k: float = 0.5,
) -> dict:
    """The offline tool's algebra over explicit count dicts. Deterministic:
    langs sorted, integer counts, elementwise float ops."""
    langs = sorted(doc_counts)
    counts = np.full((n_buckets, len(langs)), add_k, dtype=np.float64)
    for (lab, b), c in bucket_counts.items():
        counts[b, langs.index(lab)] += c
    logp = np.log(counts / counts.sum(axis=0, keepdims=True)).astype(np.float32)
    total = sum(doc_counts.values())
    prior = np.log(
        np.array([doc_counts[l] for l in langs], dtype=np.float64) / total
    ).astype(np.float32)
    return {
        "langs": np.array(langs, dtype=object),
        "logp": logp,
        "prior": prior,
        "n_buckets": np.array([n_buckets]),
    }


def train_langid_distributed(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    add_k: float = 0.5,
) -> dict:
    rows = langid_count_rows(df, label_col, text_col, n_buckets).collect()
    bucket_counts = {
        (r["label"], r["bucket"]): r["c"] for r in rows if r["kind"] == KIND_BUCKET
    }
    doc_counts = {r["label"]: r["c"] for r in rows if r["kind"] == KIND_DOCS}
    return fit_langid(bucket_counts, doc_counts, n_buckets, add_k)

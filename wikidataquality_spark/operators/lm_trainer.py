"""Distributed n-gram LM training: the KenLM-trainer analogue at corpus scale.

tools/train_lm.py is the OFFLINE driver-side trainer (20k pages in pandas —
fine for the frozen sandbox artifact). At 10¹² documents the counting has to
be the cluster's job; this module is the same factorization the BPE family
uses (operators/bpe.py):

  1. **ngram_count_rows** (distributed, ONE shuffle): an iterator
     mapInPandas pass tokenizes each Arrow batch with the SAME tokenize()
     the perplexity scorer uses (one tokenization definition engine-wide)
     and emits BATCH-LOCAL pre-aggregated (kind, w1, w2, c) rows — the
     in-UDF combine bounds Arrow traffic by each batch's VOCABULARY (Zipf:
     5-20× smaller than its token stream); a groupBy-sum completes exact
     global counts. Bigrams are within-document adjacencies only (no
     cross-doc transitions — same rule as the offline trainer).
  2. **fit_interpolated_bigram** (driver, bounded): identical smoothing
     algebra to tools/train_lm.py — p(w2|w1) = λ·c(w1,w2)/c(w1) +
     (1−λ)·p_uni(w2), add-k unigrams over an open vocab with a zeroed
     <unk> slot (OOV must stay expensive — that IS the quality signal).
     Counts are exact integers, so the distributed fit is BIT-EQUAL to a
     driver-side fit on the same corpus (gated in tests/test_lm_trainer.py).
     Vocabulary ties at the size boundary break (count desc, word asc) —
     explicit, partition-independent (pandas value_counts' first-seen tie
     order is NOT reproducible under repartitioning).
  3. the artifact dict matches the frozen .npz schema (vocab / uni_logp /
     bigram_keys / bigram_cond / lam), so `_BigramLM` can load either.

Bounded collects only: top-V unigrams (V rows) and the ≥min_count
in-vocab bigram table (≤V² in principle; `max_bigrams` guards the
pathological case with a deterministic (c desc, key asc) truncation that
is REPORTED, never silent).

Reference analogue: the TypeChecker classifier lifecycle (SURVEY §2A#8/9)
— offline train, broadcast artifact, vectorized score — with the offline
half now itself distributed.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KIND_UNI, KIND_BI = 0, 1
COUNT_SCHEMA = "kind int, w1 string, w2 string, c long"


def ngram_count_rows(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact global (kind, w1, w2, c) counts: kind 0 = unigram (w2 NULL),
    kind 1 = within-doc bigram. One partial-agg shuffle; the UDF emits
    batch-local combined counts, so shuffle rows are vocabulary-bounded."""

    def count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wikidataquality_spark.operators.tokenize import tokenize

        for pdf in batches:
            tok = tokenize(pdf[text_col])
            w = tok.exploded.to_numpy()
            codes = tok.codes
            uni = Counter(w[~pd.isna(w)])
            bi: Counter = Counter()
            if len(w) > 1:
                same = codes[1:] == codes[:-1]
                ok = same & ~pd.isna(w[1:]) & ~pd.isna(w[:-1])
                bi.update(zip(w[:-1][ok], w[1:][ok]))
            yield pd.DataFrame(
                {
                    "kind": [KIND_UNI] * len(uni) + [KIND_BI] * len(bi),
                    "w1": [k for k in uni] + [k[0] for k in bi],
                    "w2": [None] * len(uni) + [k[1] for k in bi],
                    "c": list(uni.values()) + list(bi.values()),
                }
            )

    return (
        df.select(text_col)
        .mapInPandas(count_batches, COUNT_SCHEMA)
        .groupBy("kind", "w1", "w2")
        .agg(F.sum("c").alias("c"))
    )


def fit_interpolated_bigram(
    uni_counts: dict[str, int],
    bi_counts: dict[tuple[str, str], int],
    vocab_size: int = 4000,
    min_bigram_count: int = 2,
    lam: float = 0.7,
    add_k: float = 0.1,
) -> dict:
    """The offline trainer's smoothing algebra over explicit count dicts —
    shared by the distributed path and the equality-gate reference. Pure
    float64 elementwise ops over exact integer counts: deterministic and
    path-independent."""
    top = sorted(uni_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = sorted(w for w, _ in top)
    vix = pd.Index(vocab)
    V = len(vocab)

    uwords = list(uni_counts)
    uidx = vix.get_indexer(uwords)
    uni = np.zeros(V + 1, dtype=np.float64)
    np.add.at(uni, np.where(uidx >= 0, uidx, V), [uni_counts[w] for w in uwords])
    uni[V] = 0.0  # <unk> mass zeroed — OOV stays expensive (see module doc)
    n_tokens = uni.sum()
    uni_logp = np.log((uni + add_k) / (n_tokens + add_k * (V + 1)))

    bitems = [(k, c) for k, c in bi_counts.items() if c >= min_bigram_count]
    i1 = vix.get_indexer([k[0] for k, _ in bitems])
    i2 = vix.get_indexer([k[1] for k, _ in bitems])
    known = (i1 >= 0) & (i2 >= 0)  # <unk> transitions dropped, like the tool
    keys = (i1[known].astype(np.int64) * (V + 1) + i2[known]).astype(np.int64)
    conds = np.asarray([c for _, c in bitems], dtype=np.float64)[known] / uni[i1[known]]
    order = np.argsort(keys)
    return {
        "vocab": np.array(vocab, dtype=object),
        "uni_logp": uni_logp,
        "bigram_keys": keys[order],
        "bigram_cond": conds[order],
        "lam": np.array([lam]),
    }


def train_lm_distributed(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4000,
    min_bigram_count: int = 2,
    lam: float = 0.7,
    add_k: float = 0.1,
    max_bigrams: int = 2_000_000,
) -> dict:
    """End-to-end distributed trainer. Collect bounds: `vocab_size` unigram
    rows (the full unigram table IS collected for exact <unk> mass — its
    size is the corpus vocabulary; at true web scale cap it upstream with a
    count-≥-2 filter before calling, the standard KenLM pruning) and at
    most `max_bigrams` bigram rows (deterministic (c desc, key) truncation,
    REPORTED via the returned dict's 'truncated_bigrams')."""
    counts = ngram_count_rows(df, text_col)
    uni_rows = counts.filter(F.col("kind") == KIND_UNI).select("w1", "c").collect()
    uni_counts = {r["w1"]: r["c"] for r in uni_rows}
    bi_rows = (
        counts.filter(
            (F.col("kind") == KIND_BI) & (F.col("c") >= min_bigram_count)
        )
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(max_bigrams + 1)
        .collect()
    )
    truncated = len(bi_rows) > max_bigrams
    bi_counts = {(r["w1"], r["w2"]): r["c"] for r in bi_rows[:max_bigrams]}
    art = fit_interpolated_bigram(
        uni_counts, bi_counts, vocab_size, min_bigram_count, lam, add_k
    )
    art["truncated_bigrams"] = truncated
    return art

"""KenLM-style n-gram perplexity stage (SURVEY.md §2B "Perplexity").

Iterator pandas UDF with once-per-worker model load — the exact KenLM
deployment lifecycle: an offline training job (tools/train_lm.py) freezes a
binary model artifact (models/bigram_lm_v2.npz, 129KB); each Python worker
memory-maps it once and scores whole Arrow batches vectorized.

Model: interpolated bigram with add-k unigram backoff over an open
vocabulary:  p(w2 | w1) = λ·c(w1,w2)/c(w1) + (1−λ)·p_uni(w2).
Scoring is sequence-aware and fully vectorized: one vocabulary get_indexer,
one searchsorted into the sorted bigram-key table, one bincount back to doc
grain — no per-token Python. A real KenLM .bin drops into _load_models()
behind the same (token_ids, logprobs) interface.

Parity: recasts TypeChecker/ValueTypeChecker's "classifier membership" family
(ref≈includes/ConstraintCheck/Checker/TypeChecker.php:~30-130) — the quality
class is the model's perplexity bucket (SURVEY §2A#8/9).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODEL_VERSION = "2"
_MODEL_NAME = f"bigram_lm_v{MODEL_VERSION}.npz"


def _open_model():
    """Dir-or-zip artifact load via the one shared resolver (modelio.py —
    r04 review: langid_ngram carried a verbatim copy of this logic)."""
    from wikidataquality_spark.modelio import open_model

    return open_model(_MODEL_NAME)


class _BigramLM:
    """Frozen interpolated-bigram LM (see tools/train_lm.py for training)."""

    def __init__(self) -> None:
        z = _open_model()
        self.vocab_ix = pd.Index(z["vocab"].tolist())
        self.uni_logp = z["uni_logp"]  # length V+1; slot V = <unk>
        self.bigram_keys = z["bigram_keys"]  # sorted packed (id1·(V+1)+id2)
        self.bigram_cond = z["bigram_cond"]  # c(w1,w2)/c(w1)
        self.lam = float(z["lam"][0])
        self.V = len(self.vocab_ix)
        self.unk_logp = float(self.uni_logp[self.V])

    def token_ids(self, exploded: pd.Series) -> np.ndarray:
        ids = self.vocab_ix.get_indexer(exploded.to_numpy())
        ids[ids < 0] = self.V
        return ids

    def logprobs(self, ids: np.ndarray, codes: np.ndarray) -> np.ndarray:
        """Per-token log-probs for a (doc-id, token-id) stream. First token
        of each document scores as unigram; transitions never cross docs."""
        n = len(ids)
        if n == 0:
            return np.empty(0)
        uni_p = np.exp(self.uni_logp[ids])
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = codes[1:] != codes[:-1]

        if len(self.bigram_keys) == 0:
            # Pure-unigram fallback: numpy `&` doesn't short-circuit, so the
            # indexing below would hit pos_c=-1 into a zero-length array.
            p = (1.0 - self.lam) * uni_p
            return np.where(first, self.uni_logp[ids], np.log(p))

        keys = np.empty(n, dtype=np.int64)
        keys[0] = 0
        keys[1:] = ids[:-1].astype(np.int64) * (self.V + 1) + ids[1:]
        pos = np.searchsorted(self.bigram_keys, keys)
        pos_c = np.minimum(pos, len(self.bigram_keys) - 1)
        hit = self.bigram_keys[pos_c] == keys
        cond = np.where(hit, self.bigram_cond[pos_c], 0.0)

        p = self.lam * cond + (1.0 - self.lam) * uni_p
        return np.where(first, self.uni_logp[ids], np.log(p))

    def perplexity(self, texts: pd.Series, tok=None) -> pd.Series:
        from wikidataquality_spark.operators.tokenize import tokenize

        tok = tok or tokenize(texts)
        ids = self.token_ids(tok.exploded)
        lp = self.logprobs(ids, tok.codes)
        n_rows = len(texts)
        counts = np.bincount(tok.codes, minlength=n_rows).astype(np.int64)
        lp_sum = np.bincount(tok.codes, weights=lp, minlength=n_rows)
        mean_lp = np.where(counts == 0, self.unk_logp, lp_sum / np.maximum(counts, 1))
        ppl = np.exp(-mean_lp)
        return pd.Series(ppl, index=texts.index).astype(float).where(~texts.isna(), np.nan)


def _load_models() -> _BigramLM:
    return _BigramLM()


@F.pandas_udf(T.DoubleType())
def perplexity_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    model = _load_models()  # once per worker
    for texts in batches:
        yield model.perplexity(texts)


def with_perplexity(df, text_col: str = "text"):
    return df.withColumn("perplexity", perplexity_udf(F.col(text_col)))


def perplexity(text_col: str | Column = "text") -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return perplexity_udf(col)

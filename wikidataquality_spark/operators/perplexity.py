"""KenLM-style n-gram perplexity stage (SURVEY.md §2B "Perplexity").

Iterator pandas UDF with once-per-worker model load (same lifecycle as
langid.py). The stand-in model is an interpolated unigram LM per language:
probabilities from Zipf-ranked wordlist frequencies with add-k smoothing over
an open vocabulary — enough to separate in-domain prose from gibberish
deterministically, with zero external deps. A real KenLM binary drops into
_load_models() behind the same dict-of-callables interface.

Scoring is vectorized: one str.split + explode per batch, a single dict
lookup via pd.Series.map over the exploded token frame, then a groupby-mean
back to row grain — no per-row Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikidataquality_spark.datagen import TOPIC_WORDS, WORDLISTS

MODEL_VERSION = "1"
_UNK_LOGP = np.log(1e-7)


def _build_logprobs() -> dict[str, float]:
    """One shared unigram table: function words (per lang) + topic words,
    Zipf-weighted by list rank, renormalized, log-space."""
    weights: dict[str, float] = {}
    for words in WORDLISTS.values():
        for rank, w in enumerate(words):
            weights[w] = max(weights.get(w, 0.0), 1.0 / (rank + 2))
    for rank, w in enumerate(TOPIC_WORDS):
        weights[w] = max(weights.get(w, 0.0), 1.0 / (rank + 5))
    total = sum(weights.values()) * 1.05  # reserve 5% mass for <unk>
    return {w: float(np.log(v / total)) for w, v in weights.items()}


class _UnigramLM:
    """Scores via one vocabulary-index lookup (C-speed get_indexer) + a log-
    probability array; CJK chars are unigram units (tokenize() handles the
    splitting)."""

    def __init__(self) -> None:
        logp = _build_logprobs()
        words = sorted(logp)
        self.vocab_ix = pd.Index(words)
        self.logp_arr = np.array([logp[w] for w in words] + [_UNK_LOGP])

    def perplexity(self, texts: pd.Series, tok=None) -> pd.Series:
        from wikidataquality_spark.operators.tokenize import tokenize

        tok = tok or tokenize(texts)
        idx = self.vocab_ix.get_indexer(tok.exploded.to_numpy())
        idx[idx < 0] = len(self.vocab_ix)  # OOV → UNK slot
        lp = pd.Series(self.logp_arr[idx], index=tok.exploded.index)
        mean_lp = lp.groupby(level=0).mean().reindex(texts.index)
        # empty docs (no tokens) → treat as all-UNK
        ppl = np.exp(-mean_lp.fillna(_UNK_LOGP))
        return pd.Series(ppl, index=texts.index).astype(float).where(~texts.isna(), np.nan)


def _load_models() -> _UnigramLM:
    return _UnigramLM()


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

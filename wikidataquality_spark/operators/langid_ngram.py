"""fastText-style char-n-gram language ID (the n-gram heuristic family).

Supervised multinomial scorer over hashed character trigrams — fastText's
langid feature family — trained offline by tools/train_langid.py and frozen
to models/langid_ngram_v1.npz (239KB, ships in the --py-files zip). Includes
an explicit 'und' class trained on gibberish/symbol-spam pages, so junk text
gets a rejectable label instead of a confident wrong language.

Iterator pandas UDF, model loaded once per worker; scoring per doc is three
vectorized ops (codepoint array → hash mix → logp gather-sum).

This operator complements operators/langid.py (the marker-word model wired
into the pipeline's frozen golden semantics): same UDF interface, swappable
via the pipeline config. Parity: TypeChecker classifier-membership recast
(SURVEY §2A#8).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODEL_VERSION = "1"
_MODEL_NAME = f"langid_ngram_v{MODEL_VERSION}.npz"
_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "models", _MODEL_NAME
)

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)

NGRAM_RESULT_TYPE = T.StructType(
    [
        T.StructField("lang_pred", T.StringType(), True),
        T.StructField("lang_conf", T.DoubleType(), True),
    ]
)


def _open_model():
    if os.path.exists(_MODEL_PATH):
        return np.load(_MODEL_PATH, allow_pickle=True)
    import io
    import pkgutil

    blob = pkgutil.get_data("wikidataquality_spark", f"models/{_MODEL_NAME}")
    if blob is None:
        raise FileNotFoundError(f"model artifact {_MODEL_NAME} not packaged")
    return np.load(io.BytesIO(blob), allow_pickle=True)


class _NgramLangId:
    def __init__(self) -> None:
        z = _open_model()
        self.langs = list(z["langs"])
        self.logp = z["logp"].astype(np.float64)  # (n_buckets, n_langs)
        self.prior = z["prior"].astype(np.float64)
        self.n_buckets = int(z["n_buckets"][0])
        self.mask = np.uint64(self.n_buckets - 1)

    def _hashes(self, text: str) -> np.ndarray:
        s = " " + text.lower() + " "
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if len(cp) < 3:
            return np.zeros(0, dtype=np.int64)
        h = cp[:-2] * _P1 ^ cp[1:-1] * _P2 ^ cp[2:] * _P3
        return (h & self.mask).astype(np.int64)

    def predict(self, texts: pd.Series) -> pd.DataFrame:
        preds: list[str | None] = []
        confs: list[float] = []
        for t in texts:
            # isinstance, not `is None`: pandas object columns deliver
            # missing strings as float NaN too (truthy, not None), which
            # would crash at t.lower() below
            if not isinstance(t, str) or not t:
                preds.append(None)
                confs.append(float("nan"))
                continue
            h = self._hashes(t)
            if len(h) == 0:
                preds.append("und")
                confs.append(0.0)
                continue
            # mean log-likelihood per trigram + prior; softmax → confidence
            ll = self.logp[h].sum(axis=0) / len(h) + self.prior / max(len(h), 1)
            ll = ll - ll.max()
            p = np.exp(ll)
            p /= p.sum()
            j = int(p.argmax())
            preds.append(self.langs[j])
            confs.append(float(p[j]))
        return pd.DataFrame(
            {"lang_pred": preds, "lang_conf": confs}, index=texts.index
        )


def _load_model() -> _NgramLangId:
    return _NgramLangId()


@F.pandas_udf(NGRAM_RESULT_TYPE)
def langid_ngram_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    model = _load_model()  # once per worker
    for texts in batches:
        yield model.predict(texts)


def with_ngram_langid(df, text_col: str = "text"):
    res = langid_ngram_udf(F.col(text_col))
    return (
        df.withColumn("_nl", res)
        .select(
            "*",
            F.col("_nl.lang_pred").alias("lang_pred_ngram"),
            F.col("_nl.lang_conf").alias("lang_conf_ngram"),
        )
        .drop("_nl")
    )


def ngram_langid(text_col: str | Column = "text") -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return langid_ngram_udf(col)

"""Train + freeze the char-n-gram language-ID model (fastText-style).

Supervised multinomial model over hashed character trigrams — the same
feature family fastText's langid uses (char n-grams, hashed, linear
scorer). Training data: the deterministic synthetic corpus (seed 1234,
disjoint from the golden fixture corpus) with datagen's `lang` column as
labels; gibberish/defect pages train an explicit 'und' class so low-quality
text maps to a rejectable label instead of a confident wrong language.

Artifact: models/langid_ngram_v1.npz — (n_buckets × n_langs) float32
log-prob matrix + priors. Loaded once per worker by
operators/langid_ngram.py.

Usage: python tools/train_langid.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_PAGES = 20000
TRAIN_SEED = 1234
N_BUCKETS = 1 << 16
ADD_K = 0.5

# featurizer + version come from the SERVING operator — train and serve can
# never skew on hash constants, padding, or artifact filename (r04 review:
# this file previously carried a verbatim copy of both)
from wikidataquality_spark.operators.langid_ngram import (  # noqa: E402
    MODEL_VERSION,
    trigram_hashes as _serving_trigram_hashes,
)

_MASK = np.uint64(N_BUCKETS - 1)


def trigram_hashes(text: str) -> np.ndarray:
    """Hashed char trigrams — the serving featurizer at this trainer's bucket
    count."""
    return _serving_trigram_hashes(text, _MASK)


def main() -> None:
    from wikidataquality_spark.datagen import generate_pages_with_meta
    from wikidataquality_spark.operators.extract import extract_text_series

    pdf = generate_pages_with_meta(TRAIN_PAGES, seed=TRAIN_SEED)
    text = extract_text_series(pdf["html"])
    # gibberish / symbol-spam pages train the 'und' class; every other page
    # (incl. dups and short pages — real language) keeps its TRUE language
    # (not the 7%-noisy claimed `lang` column)
    und = pdf["defect"].isin(["gibberish", "symbol_spam"])
    labels = pdf["true_lang"].where(~und, "und")

    langs = sorted(labels.unique())
    counts = np.full((N_BUCKETS, len(langs)), ADD_K, dtype=np.float64)
    for t, lab in zip(text, labels):
        if t:
            h = trigram_hashes(t)
            counts[:, langs.index(lab)] += np.bincount(h, minlength=N_BUCKETS)

    logp = np.log(counts / counts.sum(axis=0, keepdims=True)).astype(np.float32)
    prior = np.log(labels.value_counts().reindex(langs).to_numpy() / len(labels)).astype(np.float32)

    out = os.path.join(REPO, "wikidataquality_spark", "models", f"langid_ngram_v{MODEL_VERSION}.npz")
    np.savez_compressed(out, langs=np.array(langs, dtype=object), logp=logp, prior=prior,
                        n_buckets=np.array([N_BUCKETS]))
    print(f"frozen {out}: langs={langs}, size={os.path.getsize(out)//1024}KB")


if __name__ == "__main__":
    main()

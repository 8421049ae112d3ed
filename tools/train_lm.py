"""Train + freeze the bigram language model used by the perplexity stage.

KenLM-style lifecycle: an OFFLINE training job produces a binary model
artifact; every Python worker then memory-loads it once and scores Arrow
batches (operators/perplexity.py). This trainer is the offline job: it
builds an interpolated bigram LM over a deterministic synthetic corpus
(datagen, seed 1234 — disjoint from the golden fixture corpus, seed 42)
and freezes it to wikidataquality_spark/models/bigram_lm_v{N}.npz.

Model: p(w2 | w1) = λ · c(w1,w2)/c(w1) + (1−λ) · p_uni(w2), with
p_uni = (c(w)+k)/(N+k·(V+1)) add-k smoothed over an open vocabulary
(slot V = <unk>). Stored arrays: vocab (sorted), unigram log-probs,
bigram keys (id1·(V+1)+id2, sorted) + bigram conditional probs.

Usage: python tools/train_lm.py   (rewrites the frozen artifact — goldens
must be regenerated afterwards, tools/make_goldens.py)
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_PAGES = 20000
TRAIN_SEED = 1234
VOCAB_SIZE = 4000
MIN_BIGRAM_COUNT = 2
LAMBDA = 0.7
ADD_K = 0.1
MODEL_VERSION = "2"


def main() -> None:
    import pandas as pd

    from wikidataquality_spark.datagen import generate_pages
    from wikidataquality_spark.operators.extract import extract_text_series
    from wikidataquality_spark.operators.tokenize import tokenize

    pdf = generate_pages(TRAIN_PAGES, seed=TRAIN_SEED)
    text = extract_text_series(pdf["html"])
    tok = tokenize(text)
    exploded = tok.exploded
    codes = tok.codes

    counts = exploded.value_counts()
    vocab = sorted(counts.head(VOCAB_SIZE).index)
    vix = pd.Index(vocab)
    V = len(vocab)

    ids = vix.get_indexer(exploded.to_numpy())
    ids[ids < 0] = V  # <unk>

    uni = np.bincount(ids, minlength=V + 1).astype(np.float64)
    # zero the <unk> count before smoothing: the raw corpus's OOV mass is
    # dominated by gibberish pages, and granting it real probability would
    # make OOV streams look normal. With only the add-k floor, p(<unk>) ≈
    # k/N ≈ 5e-8 → one OOV token costs ~17 nats — the quality-filter signal.
    uni[V] = 0.0
    n_tokens = uni.sum()
    uni_p = (uni + ADD_K) / (n_tokens + ADD_K * (V + 1))
    uni_logp = np.log(uni_p)

    # bigram counts within documents only (no cross-doc transitions), and
    # NEVER involving <unk>: the raw web training corpus contains gibberish,
    # and keeping c(<unk>,<unk>) would teach the model that OOV streams are
    # LIKELY (measured: gibberish scored ppl 2 vs clean prose 14). Dropping
    # them makes every OOV token pay the harsh unigram <unk> penalty — the
    # KenLM-on-clean-corpus behavior the quality filter needs.
    same_doc = codes[1:] == codes[:-1]
    known = (ids[1:] != V) & (ids[:-1] != V)
    mask = same_doc & known
    w1 = ids[:-1][mask]
    w2 = ids[1:][mask]
    keys = w1.astype(np.int64) * (V + 1) + w2
    uk, kc = np.unique(keys, return_counts=True)
    keep = kc >= MIN_BIGRAM_COUNT
    uk, kc = uk[keep], kc[keep]
    cond = kc / uni[(uk // (V + 1))]  # c(w1,w2)/c(w1)

    out_dir = os.path.join(REPO, "wikidataquality_spark", "models")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"bigram_lm_v{MODEL_VERSION}.npz")
    np.savez_compressed(
        path,
        vocab=np.array(vocab, dtype=object),
        uni_logp=uni_logp,
        bigram_keys=uk,
        bigram_cond=cond,
        lam=np.array([LAMBDA]),
        meta=np.array(
            [TRAIN_PAGES, TRAIN_SEED, VOCAB_SIZE, MIN_BIGRAM_COUNT], dtype=np.int64
        ),
    )
    print(
        f"frozen {path}: V={V}, bigrams={len(uk)}, "
        f"train_tokens={int(n_tokens)}, size={os.path.getsize(path)//1024}KB"
    )


if __name__ == "__main__":
    main()

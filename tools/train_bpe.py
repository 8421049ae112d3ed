"""Train + freeze the BPE merge artifact (models/bpe_v1.json).

Corpus: the sf0.01 documents fixture (hermetic by contract — no external
data), segmented by the engine's shared piece regex. 512 merges over the
top-50k pieces is deliberately small: the artifact is a train-once stand-in
whose JOB is to exercise the distributed count → driver merge → broadcast
encode machinery with real Zipf statistics; a production run would raise
n_merges/max_words, not change the code path.

Deterministic end to end: exact distributed counts, (count desc, word)
ordered collect, lexicographic tie-breaks, no RNG.

Usage: python tools/train_bpe.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"
N_MERGES = 512
MAX_WORDS = 50_000


def main() -> None:
    from wikidataquality_spark.operators.bpe import (
        BPE_V1,
        save_bpe,
        train_bpe_from_df,
    )
    from wikidataquality_spark.session import get_spark

    spark = get_spark(cpus=8)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    art = train_bpe_from_df(docs, n_merges=N_MERGES, max_words=MAX_WORDS)
    art["trained_on"] = {"sf_dir": SF, "table": "documents", "max_words": MAX_WORDS}
    save_bpe(art)
    print(f"wrote {BPE_V1}: {len(art['merges'])} merges")


if __name__ == "__main__":
    main()

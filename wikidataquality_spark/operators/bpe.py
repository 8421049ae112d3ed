"""Trained BPE tokenizer: distributed word counts → driver merges → broadcast encode.

The scalable shape for learning a subword vocabulary over a 10¹²-document
corpus (the SentencePiece / fastBPE factorization):

  1. **word_counts** (distributed, ONE shuffle): pre-tokenize every document
     with the engine's shared piece regex (textstats.BPE_PIECES_RE — the
     same families `token_count_by_source` and `pack_sequences` count) and
     aggregate (piece, count). The output is bounded by VOCABULARY size
     (Heaps' law: ~10⁶-10⁷ distinct pieces at web scale), independent of
     corpus size — partial aggregation keeps per-partition state at distinct
     pieces, never documents.
  2. **train_bpe** (driver, bounded): classic pair-count/merge loop over the
     top-V (count, piece)-ordered word table. BPE merges are inherently
     sequential, but every pair count is a function of the word-count table
     alone — training driver-side on the bounded table IS the distributed
     algorithm (the corpus was consumed by stage 1), not a shortcut.
     Incremental pair bookkeeping (only words containing the merged pair are
     re-segmented) keeps it O(total_chars + merges·touched); deterministic
     end to end — ties break (count desc, pair lexicographic), no RNG.
  3. **bpe_tokens** (distributed, ZERO shuffle): encode via one iterator
     pandas UDF. Pieces are extracted JVM-side by the SAME shared regex (the
     UDF never re-tokenizes — one segmentation definition for the whole
     engine); the merge-rank dict rides the closure (broadcast by Spark's
     task serialization, ~100 KB for 8k merges); a per-executor word cache
     exploits Zipf reuse (the few thousand most frequent pieces cover most
     token mass, so steady-state encode is a dict hit, not a merge loop).

Merge semantics (train and encode MUST agree; property-gated):
  - a word is segmented as its codepoints + a trailing end-of-word symbol;
  - pair counts include overlapping occurrences ("aaa" counts (a,a) twice);
  - applying a merge rewrites left-to-right non-overlapping ("aaa"+(a,a) →
    ("aa","a"));
  - encode greedily applies the LOWEST-RANK pair present anywhere in the
    word until none applies — identical to replaying training's merge order
    restricted to this word, hence vocabulary closure: every emitted token
    is a learned merge product or a single codepoint (+ EOW).

Train-once artifact: models/bpe_v1.json (tools/train_bpe.py), same
discipline as the DSIR/quality/centroid artifacts — retraining is a
deliberate act, never a side effect of a query.

Reference analogue: TypeChecker's classifier ethos (ref≈includes/
ConstraintCheck/Checker/TypeChecker.php:~40-90) — a learned, versioned
model applied per row — here producing the token stream itself.
"""

from __future__ import annotations

import json
import os
from collections import Counter, defaultdict
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikidataquality_spark.operators.textstats import bpe_pieces

EOW = "</w>"
_MODELS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "models")
BPE_V1 = os.path.join(_MODELS, "bpe_v1.json")


# --- stage 1: distributed word counts ---------------------------------------


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the shared piece segmentation. One partial-agg shuffle;
    result rows = distinct pieces (vocabulary-bounded, NOT corpus-bounded)."""
    return (
        df.select(F.explode(bpe_pieces(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def top_words(df: DataFrame, text_col: str = "text", max_words: int = 50_000) -> list[tuple[str, int]]:
    """Deterministic bounded training table: top-`max_words` pieces by
    (count desc, word) — the ONLY collect in the family, capped by design
    (a 10¹²-doc corpus still returns ≤ max_words rows)."""
    rows = (
        word_counts(df, text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return [(r["word"], r["n"]) for r in rows]


# --- stage 2: driver-side merge training ------------------------------------


def _segment(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def _apply_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Left-to-right non-overlapping rewrite of `pair` into its concat."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pairs(syms: tuple[str, ...]) -> list[tuple[str, str]]:
    return [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]


def train_bpe(
    counts: list[tuple[str, int]], n_merges: int, min_count: int = 2
) -> dict:
    """Learn `n_merges` merges from a (word, count) table. Deterministic:
    best pair = max count, ties to the lexicographically smallest pair.
    Stops early when no pair reaches `min_count` (merging singletons would
    just memorize the tail). Incremental bookkeeping: pair_counts and a
    pair→word index are updated only for words containing the merged pair."""
    segs: dict[int, tuple[str, ...]] = {i: _segment(w) for i, (w, _) in enumerate(counts)}
    wc = {i: c for i, (_, c) in enumerate(counts)}
    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in segs.items():
        for p in _pairs(syms):
            pair_counts[p] += wc[i]
            where[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best, best_n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_count:
            break
        merges.append(best)
        for i in sorted(where[best]):  # sorted: identical Counter evolution every run
            old = segs[i]
            new = _apply_merge(old, best)
            segs[i] = new
            for p in _pairs(old):
                pair_counts[p] -= wc[i]
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    where.pop(p, None)
            for p in _pairs(new):
                pair_counts[p] += wc[i]
                where[p].add(i)
            for p in set(_pairs(old)) - set(_pairs(new)):
                if p in where:
                    where[p].discard(i)
    return {
        "version": 1,
        "eow": EOW,
        "pre_tokenizer": "bpe_pieces_v1",
        "n_merges_requested": n_merges,
        "merges": [list(p) for p in merges],
    }


def train_bpe_from_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 512,
    max_words: int = 50_000,
) -> dict:
    """End-to-end trainer: distributed counts → bounded collect → merges."""
    return train_bpe(top_words(df, text_col, max_words), n_merges)


def save_bpe(art: dict, path: str = BPE_V1) -> None:
    with open(path, "w") as f:
        json.dump(art, f, indent=1)


def load_bpe(path: str = BPE_V1) -> dict:
    with open(path) as f:
        art = json.load(f)
    if art.get("version") != 1 or art.get("eow") != EOW:
        raise ValueError(f"unsupported bpe artifact at {path}")
    return art


# --- stage 3: distributed encode ---------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy lowest-rank merge loop — replays training's merge order on one
    word. Pure function of (word, ranks); the UDF wraps it with a cache."""
    syms = _segment(word)
    while len(syms) > 1:
        ranked = [
            (ranks[p], p) for p in set(_pairs(syms)) if p in ranks
        ]
        if not ranked:
            break
        _, best = min(ranked)
        syms = _apply_merge(syms, best)
    return syms


def bpe_tokens(text: Column | str, art: dict, cache_size: int = 65_536) -> Column:
    """array<string> of BPE tokens for a text column. JVM-side piece
    extraction (shared regex) → ONE iterator-Arrow stage mapping pieces
    through the merge table with a Zipf cache. NULL → NULL; '' → []."""
    ranks = {tuple(p): r for r, p in enumerate(art["merges"])}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, tuple[str, ...]] = {}

        def enc(pieces) -> list[str] | None:
            if pieces is None:
                return None
            out: list[str] = []
            for w in pieces:
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    if len(cache) < cache_size:
                        cache[w] = toks
                out.extend(toks)
            return out

        for pieces_s in batches:
            yield pieces_s.map(enc)

    col = F.col(text) if isinstance(text, str) else text
    return _encode(bpe_pieces(col))


def with_bpe_tokens(
    df: DataFrame,
    art: dict | None = None,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Attach the trained-BPE token array (and its exact count — the token
    budget `pack_sequences`-style packing runs on)."""
    art = art or load_bpe()
    tok = bpe_tokens(F.col(text_col), art)
    return df.withColumn(out_col, tok).withColumn(
        f"{out_col.removesuffix('_tokens')}_token_count", F.size(out_col).cast("long")
    )

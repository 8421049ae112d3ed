"""Training-shard export — the last mile: curated docs → the fixed-length
integer-token blocks a dataloader actually reads.

pack_sequences ASSIGNS documents to blocks (pure integer bookkeeping);
this module MATERIALIZES the blocks: dense token ids from a
corpus-derived vocabulary, the per-(source, shard) token streams
concatenated in stream order, and seq_len-sized id arrays with the final
partial block padded. The cross-operator contract is exact and gated:
each document's first token lands at absolute stream position
pack_id·seq_len + pack_offset — the packing table and the materialized
shards describe the same stream (when pack_sequences is driven by the
SAME counter, n_tokens_col = F.size(token_ids); its default text
estimate diverges from real BPE id counts).

Scale design:
  - the vocabulary is VOCABULARY-bounded (Heaps' law: ~10⁶-10⁷ pieces at
    web scale), so (piece, id) fits the driver/broadcast like every other
    train-once artifact; ids are dense ranks over sorted pieces —
    deterministic under retry/repartition, id 0 reserved for PAD, 1 for
    UNK (a piece absent from the vocab build — e.g. encoding a new batch
    against a frozen vocab — never crashes the export);
  - encoding is ONE iterator-Arrow pass closed over the vocab dict (no
    corpus-wide token-row explode/shuffle);
  - block assembly is a bounded applyInPandas per (source, shard) — the
    SAME bounded unit pack_sequences' window uses (shard_docs documents),
    never a global-order operation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAD_ID = 0
UNK_ID = 1
_ID_BASE = 2  # first real piece id

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("shard", T.LongType(), False),
        T.StructField("pack_id", T.LongType(), False),
        T.StructField("token_ids", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_real_tokens", T.IntegerType(), False),  # rest is PAD
    ]
)


def vocab_table(docs: DataFrame, tokens_col: str = "bpe_tokens") -> DataFrame:
    """(piece, token_id) with dense deterministic ids: distinct pieces
    ranked in sorted order (ids start at _ID_BASE; 0/1 are PAD/UNK). The
    distinct + rank work on the VOCABULARY, never the corpus — the same
    bounded-table factorization as the BPE trainer."""
    from pyspark.sql.window import Window as W

    pieces = (
        docs.select(F.explode(tokens_col).alias("piece"))
        .filter(F.col("piece").isNotNull())
        .distinct()
    )
    return pieces.select(
        "piece",
        (F.row_number().over(W.orderBy("piece")) + _ID_BASE - 1).alias("token_id"),
    )


def encode_token_ids(
    docs: DataFrame,
    vocab: dict[str, int],
    tokens_col: str = "bpe_tokens",
    out_col: str = "token_ids",
) -> DataFrame:
    """Map piece arrays → dense id arrays in one iterator-Arrow pass closed
    over the (vocabulary-bounded) vocab dict. Unknown pieces → UNK_ID;
    NULL token arrays → empty id arrays (the zero-width slot pack_sequences
    gives NULL text)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        get = vocab.get
        for s in batches:
            yield s.map(
                lambda pieces: []
                if pieces is None
                else [get(p, UNK_ID) for p in pieces]
            )

    return docs.withColumn(out_col, enc(F.col(tokens_col)))


def export_token_shards(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    ids_col: str = "token_ids",
    shard_docs: int = 10_000,
) -> DataFrame:
    """Materialize SHARD_SCHEMA rows: per (source, shard), documents'
    id arrays concatenate in id order and slice into seq_len blocks,
    pack_id counting from 0 within the (source, shard) stream — exactly
    pack_sequences' stream definition, so the two tables agree block for
    block (gated). PRECONDITION for that agreement: drive pack_sequences
    with n_tokens_col = F.size(<ids_col>) — its DEFAULT counter is the
    bpe_ish TEXT estimate, which diverges from real BPE id counts and
    would shift every downstream assignment. The final partial block pads
    with PAD_ID and reports its real-token count, and every pack_id the
    pack table can assign is materialized: a zero-width (NULL-text) doc
    sitting after an exactly-full stream owns block k with zero real
    tokens, so an all-PAD block row exists for it (a consumer seeking any
    pack-table pack_id always finds its shard row)."""
    shard = F.floor(F.col(id_col) / shard_docs).cast("long")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("_sid")
        arrays = [
            np.asarray(ids, dtype=np.int32)
            for ids in pdf["_ids"]
            if ids is not None and len(ids)
        ]
        stream = (
            np.concatenate(arrays) if arrays else np.empty(0, dtype=np.int32)
        )
        n = len(stream)
        # block count harmonized with the pack table: each doc's block is
        # cum_before // seq_len; a trailing zero-width doc after an
        # exactly-full stream claims one block past ceil(n/L)
        cum = 0
        max_doc_block = 0
        for ids in pdf["_ids"]:
            max_doc_block = max(max_doc_block, cum // seq_len)
            cum += 0 if ids is None else len(ids)
        n_blocks = max(1, -(-n // seq_len), max_doc_block + 1)
        padded = np.full(n_blocks * seq_len, PAD_ID, dtype=np.int32)
        padded[:n] = stream
        blocks = padded.reshape(n_blocks, seq_len)
        src = pdf["_src"].iloc[0]
        shd = int(pdf["_shard"].iloc[0])
        rows = [
            {
                "source": src,
                "shard": shd,
                "pack_id": b,
                "token_ids": blocks[b].tolist(),
                "n_real_tokens": max(0, min(seq_len, n - b * seq_len)),
            }
            for b in range(n_blocks)
        ]
        return pd.DataFrame(rows, columns=[f.name for f in SHARD_SCHEMA.fields])

    return (
        docs.select(
            F.col(id_col).alias("_sid"),
            F.col(source_col).alias("_src"),
            shard.alias("_shard"),
            F.col(ids_col).alias("_ids"),
        )
        .groupBy("_src", "_shard")
        .applyInPandas(assemble, SHARD_SCHEMA)
    )

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


# ---------------------------------------------------------------------------
# Binary sidecar export (r04 VERDICT #7): the memmap-standard .bin/.idx pair
# a dataloader mmaps directly — parquet arrays are an analytics format, not
# a training-loop format.
# ---------------------------------------------------------------------------

BIN_MAGIC = b"WDQSHARD"
BIN_VERSION = 1

BINARY_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_blocks", T.LongType(), False),
        T.StructField("dtype_bytes", T.IntegerType(), False),
        T.StructField("bin_blob", T.BinaryType(), False),
        T.StructField("idx_blob", T.BinaryType(), False),
    ]
)


def shard_dtype_bytes(vocab_size: int) -> int:
    """2 (uint16) when every id — PAD/UNK included — fits 16 bits, else 4
    (uint32): the standard id-width rule memmap dataloaders key on."""
    return 2 if vocab_size + _ID_BASE <= (1 << 16) else 4


def pack_idx(seq_len: int, dtype_bytes: int, n_real: list[int]) -> bytes:
    """The .idx sidecar, little-endian throughout:
    magic(8) | version u32 | dtype_bytes u32 | seq_len u64 | n_blocks u64 |
    n_real_tokens u32 × n_blocks. Everything a loader needs to mmap the
    .bin as (n_blocks, seq_len) ids and mask padding."""
    import struct

    return (
        BIN_MAGIC
        + struct.pack("<IIQQ", BIN_VERSION, dtype_bytes, seq_len, len(n_real))
        + struct.pack(f"<{len(n_real)}I", *n_real)
    )


def read_idx(idx: bytes) -> dict:
    """Python mirror of pack_idx — the reconstruction half the byte-exact
    gates run (and the reference decoder for any external loader)."""
    import struct

    if idx[:8] != BIN_MAGIC:
        raise ValueError("bad shard idx magic")
    version, dtype_bytes, seq_len, n_blocks = struct.unpack("<IIQQ", idx[8:32])
    if version != BIN_VERSION:
        raise ValueError(f"unsupported shard idx version {version}")
    n_real = list(struct.unpack(f"<{n_blocks}I", idx[32 : 32 + 4 * n_blocks]))
    return {
        "version": version,
        "dtype_bytes": dtype_bytes,
        "seq_len": seq_len,
        "n_blocks": n_blocks,
        "n_real_tokens": n_real,
    }


def binary_shard_blobs(
    shards: DataFrame, seq_len: int, vocab_size: int
) -> DataFrame:
    """SHARD_SCHEMA rows → one (source, shard, bin_blob, idx_blob) row per
    (source, shard): blocks concatenated in pack_id order as little-endian
    uint16/uint32 ids (width by shard_dtype_bytes — uint16 halves the
    training-set bytes whenever the vocab allows). Same bounded
    per-(source, shard) assembly unit as export_token_shards, and the same
    sink posture as io/warc.encode_warc_partitions: executors produce
    blobs, the caller hands them to any binary sink (tools/curate_corpus.py
    writes <sanitized>_<shard>.bin/.idx files + a path manifest) — no
    executor-side filesystem coupling, and the blobs are directly
    gate-able. One (source, shard)'s serialized bytes live in memory at
    once — shard_docs bounds that at ~10k docs, the pack window's own
    unit."""
    dtype_bytes = shard_dtype_bytes(vocab_size)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("pack_id")
        dt = np.dtype("<u2") if dtype_bytes == 2 else np.dtype("<u4")
        ids = np.asarray(
            [np.asarray(b, dtype=np.int64) for b in pdf["token_ids"]],
            dtype=np.int64,
        )
        if ids.size and int(ids.max()) >= (1 << (8 * dtype_bytes)):
            raise ValueError(
                f"token id {int(ids.max())} overflows dtype_bytes={dtype_bytes} "
                "— vocab_size passed to binary_shard_blobs understates the vocab"
            )
        blob = ids.astype(dt).tobytes()
        idx = pack_idx(seq_len, dtype_bytes, [int(x) for x in pdf["n_real_tokens"]])
        return pd.DataFrame(
            [
                {
                    "source": pdf["source"].iloc[0],
                    "shard": int(pdf["shard"].iloc[0]),
                    "n_blocks": len(pdf),
                    "dtype_bytes": dtype_bytes,
                    "bin_blob": blob,
                    "idx_blob": idx,
                }
            ],
            columns=[f.name for f in BINARY_SHARD_SCHEMA.fields],
        )

    return shards.groupBy("source", "shard").applyInPandas(
        assemble, BINARY_SHARD_SCHEMA
    )


def decode_binary_shard(bin_blob: bytes, idx_blob: bytes) -> list[list[int]]:
    """Pure-python reconstruction: .bin/.idx pair → the block id lists —
    the byte-exact round-trip mirror (tests assert equality with the
    SHARD_SCHEMA rows the blobs were built from)."""
    import numpy as np

    meta = read_idx(idx_blob)
    dt = np.dtype("<u2") if meta["dtype_bytes"] == 2 else np.dtype("<u4")
    flat = np.frombuffer(bin_blob, dtype=dt)
    if len(flat) != meta["n_blocks"] * meta["seq_len"]:
        raise ValueError("bin/idx length mismatch")
    return [
        [int(x) for x in row]
        for row in flat.reshape(meta["n_blocks"], meta["seq_len"])
    ]

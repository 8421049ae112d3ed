"""Sequence packing — assign documents to fixed-length training sequences.

The standard pretraining data-prep step: documents are concatenated in a
deterministic order and chunked into fixed `seq_len`-token blocks ("packs");
each document is assigned the pack index and intra-pack offset where its
first token lands (the trainer then materializes token blocks by slicing the
concatenation — attention masking across doc boundaries is the trainer's
concern, the pipeline's job is the deterministic assignment).

Scale shape: packing needs a running token prefix-sum, and a naive global
`SUM() OVER (ORDER BY doc_id)` serializes the whole corpus through ONE
window reducer — the classic non-scalable cumsum. Training shards are
independent by construction, so the operator scopes the concatenation to
(source, shard) where shard = doc_id // shard_docs: window partitions are
bounded at `shard_docs` rows regardless of corpus size, the cumsum
parallelizes across shards, and the assignment stays fully deterministic
and reproducible (contiguous doc_id ranges, not hash buckets, so a shard is
a stable byte-range of the corpus). At 100 TB this is exactly how packed
pretraining shards are laid out: many independent sequence streams, one per
(source, shard), each a few GB.

Token counts use the BPE-ish pre-tokenizer estimate (textstats.
bpe_ish_token_count — letter-runs / digit-runs / punctuation singletons,
the unit families real BPE pre-tokenizers split on); a real tokenizer would
slot in as an iterator pandas UDF upstream without changing the packing
algebra. All emitted columns are integers, so the DuckDB oracle comparison
is exact with no float rounding protocol.

ref≈ the reference's batch report jobs (deterministic corpus partitioning);
packing itself is public pretraining practice (GPT-3 §2.1, T5 §3.1.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from wikidataquality_spark.operators.textstats import (
    BPE_PIECES_RE_SQL as _BPE_RE,
    bpe_ish_token_count,
)


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    shard_docs: int = 10_000,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    n_tokens_col: Column | None = None,
) -> DataFrame:
    """(doc_id, source, shard, n_tokens, pack_id, pack_offset) per document.

    pack_id is the seq_len-block index (within the (source, shard) stream)
    containing the document's first token; pack_offset is its position inside
    that block. NULL text packs as 0 tokens — the doc occupies a zero-width
    slot instead of silently vanishing from the stream (count parity with the
    input matters for resume bookkeeping).

    Pass `n_tokens_col` to pack on a different token counter (e.g. a real
    tokenizer's output column) without changing the assignment algebra."""
    nt = (
        n_tokens_col
        if n_tokens_col is not None
        else F.coalesce(
            bpe_ish_token_count(F.col(text_col)).cast("long"), F.lit(0).cast("long")
        )
    )
    shard = F.floor(F.col(id_col) / shard_docs).cast("long")
    w = (
        W.partitionBy(source_col, "shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        docs.select(
            F.col(id_col),
            F.col(source_col),
            shard.alias("shard"),
            nt.alias("n_tokens"),
        )
        .withColumn("_cum_before", cum_before)
        .select(
            id_col,
            source_col,
            "shard",
            "n_tokens",
            (F.col("_cum_before") / seq_len).cast("long").alias("pack_id"),
            (F.col("_cum_before") % seq_len).cast("long").alias("pack_offset"),
        )
    )




def pack_sequences_sql(
    seq_len: int = 2048,
    shard_docs: int = 10_000,
    table: str = "documents",
) -> str:
    """DuckDB twin of pack_sequences — identical shard arithmetic, identical
    window frame (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING), identical
    pre-tokenizer regex; every column an exact integer."""
    return rf"""
WITH t AS (
  SELECT doc_id, source,
         CAST(FLOOR(doc_id / {shard_docs}) AS BIGINT) AS shard,
         CAST(COALESCE(len(regexp_extract_all(text, '{_BPE_RE}')), 0) AS BIGINT) AS n_tokens
  FROM {table}),
c AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (
      PARTITION BY source, shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t)
SELECT doc_id, source, shard, n_tokens,
       CAST(FLOOR(cum_before / {seq_len}) AS BIGINT) AS pack_id,
       CAST(cum_before % {seq_len} AS BIGINT) AS pack_offset
FROM c
"""

"""Context-window chunking — sliding token windows with overlap, the
retrieval/embedding twin of sequence packing.

Parity: packing (operators/packing.py) answers "how do docs fill
fixed-length TRAINING blocks" (concat-then-chunk across docs); this module
answers the other standard question — "how does ONE long doc become
model-window-sized pieces" for embedding/retrieval indexes, where each
chunk must carry `overlap` tokens of left context so no sentence loses its
neighborhood at a boundary (the standard RAG/embedding-index shape).

Scale design: chunking is a PER-ROW operator — tokens, window starts, and
slices are all Column HOFs (split / sequence / explode / slice /
array_join), one whole-stage-codegen projection with ZERO shuffle and zero
Python. The output explodes ~n_tokens/stride rows per doc, each bounded by
chunk_tokens — downstream embedding UDFs see bounded inputs regardless of
document length (the doc that breaks a naive embedder is the 10 MB one;
chunks cap it).

Tokens are whitespace runs of the RAW text (case preserved — chunks feed
embedders, not the lowercasing model stages), so chunk_text is
whitespace-NORMALIZED, not byte-preserving: scrub/extract own byte
identity (B:15); chunking owns bounded model inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_TOKENS = 256
DEFAULT_OVERLAP = 32


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """(id, chunk_idx, n_chunks, chunk_start, chunk_len, chunk_text) — one
    row per window. Window starts step by stride = chunk_tokens − overlap;
    the last window may be short (tail), and every window after the first
    repeats exactly `overlap` tokens of its predecessor. Docs with NULL or
    token-less text produce no rows (nothing to embed — the curation DAG
    already carries those rows' accounting). All-integer `div` arithmetic:
    n_chunks = max(1, ceil((n − overlap) / stride)) stays exact past 2⁵³."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    base = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
        .withColumn(
            "_k",
            F.greatest(
                F.lit(1),
                F.expr(f"(_n - {overlap} + {stride} - 1) div {stride}"),
            ),
        )
    )
    start = F.col("chunk_idx") * stride
    piece = F.slice(F.col("_toks"), start + 1, chunk_tokens)
    return (
        base.select(
            id_col,
            F.col("_k").alias("n_chunks"),
            F.explode(F.sequence(F.lit(0), (F.col("_k") - 1).cast("int"))).alias(
                "chunk_idx"
            ),
            "_toks",
        )
        .select(
            id_col,
            "chunk_idx",
            "n_chunks",
            start.alias("chunk_start"),
            F.size(piece).alias("chunk_len"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    overlap: int = DEFAULT_OVERLAP,
) -> str:
    """DuckDB twin over a `documents` view — identical window algebra
    (same integer div), list_slice clamps the tail exactly like F.slice."""
    stride = chunk_tokens - overlap
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE {text_col} IS NOT NULL
),
b AS (
  SELECT {id_col}, toks, len(toks) AS n FROM t WHERE len(toks) > 0
),
k AS (
  SELECT {id_col}, toks, n,
         GREATEST(1, (n - {overlap} + {stride} - 1) // {stride}) AS n_chunks
  FROM b
),
g AS (
  -- scalar range() + unnest (DuckDB's binder rejects lateral
  -- generate_series over a column — same workaround as the boilerplate twin)
  SELECT {id_col}, toks, n_chunks, unnest(range(0, n_chunks)) AS chunk_idx
  FROM k
)
SELECT {id_col},
       chunk_idx,
       n_chunks,
       chunk_idx * {stride} AS chunk_start,
       len(list_slice(toks, chunk_idx * {stride} + 1,
                      chunk_idx * {stride} + {chunk_tokens})) AS chunk_len,
       array_to_string(
         list_slice(toks, chunk_idx * {stride} + 1,
                    chunk_idx * {stride} + {chunk_tokens}), ' ') AS chunk_text
FROM g
"""

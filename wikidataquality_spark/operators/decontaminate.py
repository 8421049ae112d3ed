"""Benchmark decontamination: flag documents overlapping an eval set.

The GPT-3/PaLM training-data discipline (Brown et al. 2020 appendix C):
a training document is CONTAMINATED if it shares any word n-gram (n=13
after normalization) with a held-out benchmark. At corpus scale this is a
semi-join of exploded document grams against the benchmark gram set — the
benchmark side is eval-set-sized (thousands of documents), so it broadcasts
and the corpus side never shuffles.

Parity with the engine's other gram machinery: grams are int64 ids
(xxhash64 over per-word xxhash64s — the textstats PPJoin representation),
so the explode/join runs on 8-byte keys and no n-gram string is ever
materialized. A 64-bit collision can only OVER-flag a clean document
(conservative for decontamination); P ≈ |grams|²/2⁶⁵.

Normalization (both sides, documented): lowercase, every non-alphanumeric
run collapsed to one space — the C4/GPT-3 style canonicalization that makes
punctuation and casing differences not hide overlap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.operators.barrier import barrier
from wikidataquality_spark.operators.heuristics import words_col
from wikidataquality_spark.operators.textstats import hashed_gram_ids

DEFAULT_NGRAM = 13  # GPT-3's decontamination n


def normalized_text(text: Column) -> Column:
    """Lowercase; non-alphanumeric runs → single space. Unicode classes so
    CJK survives; identical semantics in DuckDB's RE2 for the SQL twin."""
    return F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " ")


def _gram_id_rows(
    df: DataFrame, n: int, id_col: str | None, text_col: str
) -> DataFrame:
    """(id?, _gram) — one row per DISTINCT normalized word-n-gram id per
    document. Two-step select through a materialized _wh column reference —
    NOT one nested expression — so element_at reads an evaluated array
    (the textstats O(|words|²) inlining hazard); the barrier stops Catalyst
    from collapsing the projections back together."""
    cols = ([F.col(id_col)] if id_col else []) + [
        F.transform(
            words_col(normalized_text(F.col(text_col))), lambda w: F.xxhash64(w)
        ).alias("_wh")
    ]
    wh = df.select(*cols).filter(F.size("_wh") >= n)
    keep = ([id_col] if id_col else []) + [
        F.array_distinct(hashed_gram_ids(F.col("_wh"), n)).alias("_grams")
    ]
    g = barrier(wh.select(*keep))
    out = ([F.col(id_col)] if id_col else []) + [F.explode("_grams").alias("_gram")]
    return g.select(*out)


def benchmark_gram_ids(
    benchmark: DataFrame, n: int = DEFAULT_NGRAM, text_col: str = "text"
) -> DataFrame:
    """Distinct (_gram) ids of the benchmark corpus — the broadcast side."""
    return _gram_id_rows(benchmark, n, None, text_col).distinct()


def contamination_marks(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(id, n_hit_grams, contaminated) for EVERY input document — scrub-not-
    drop: consumers filter on the flag; short/NULL-text docs are clean by
    definition (no n-gram to overlap).

    NULL-id documents get contaminated = NULL ("unverifiable"), never a
    silent False: their hits cannot be re-attached through the NULL join
    key, and decontamination must fail AUDIBLE — a contaminated doc leaking
    into training data as "clean" is the one unacceptable outcome. Callers
    decide whether unverifiable rows are dropped or keyed upstream
    (r04 review).

    Plan: benchmark grams broadcast (eval sets are tiny next to the corpus);
    the document gram stream inner-joins them — only HITS survive into the
    per-doc count, so the aggregation state is bounded by contamination, not
    corpus size; a final left join re-attaches clean docs.

    Hot-gram skew note (r04 VERDICT #4 named this operator next to
    dup_spans): no gram-keyed EXCHANGE exists here to skew — the gram join
    is broadcast (doc grams never shuffle by gram), and both aggregations
    key on doc_id with map-side partial combine, so a boilerplate gram that
    happens to appear in an eval set costs one hit row per occurrence
    flowing into per-doc partial counts, never a single hot reducer key.
    The dup_spans fix (hot_gram_keys pre-marking) therefore has no
    counterpart needed here; this note records the audit."""
    bench = benchmark_gram_ids(benchmark, n=n, text_col=bench_text_col)
    doc_grams = _gram_id_rows(docs, n, id_col, text_col)
    hits = (
        doc_grams.join(F.broadcast(bench), "_gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    known = F.col(id_col).isNotNull()
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.when(known, F.coalesce("n_hit_grams", F.lit(0))).alias("n_hit_grams"),
            F.when(
                known, F.coalesce(F.col("n_hit_grams") > 0, F.lit(False))
            ).alias("contaminated"),
        )
    )


def contamination_marks_sql(n: int = DEFAULT_NGRAM) -> str:
    """DuckDB twin over `documents(doc_id, text)` + `benchmark(text)` views —
    STRING n-grams instead of the hashed ids (DuckDB has no xxhash64; equal
    output absent 64-bit collisions, which can only over-flag on the Spark
    side). Same normalization regex, same distinct-per-doc hit counting."""
    norm = "regexp_replace(lower({c}), '[^\\p{{L}}\\p{{N}}]+', ' ', 'g')"
    ws = (
        "list_filter(string_split_regex(trim(" + norm + "), '[\\t\\n\\x0B\\f\\r ]+'), w -> w <> '')"
    )
    return f"""
WITH dg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(ws) - {n} + 2),
           i -> array_to_string(ws[i:i+{n}-1], ' ')))) AS g
  FROM (SELECT doc_id, {ws.format(c='text')} AS ws FROM documents)
  WHERE len(ws) >= {n}
),
bg AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
           range(1, len(ws) - {n} + 2),
           i -> array_to_string(ws[i:i+{n}-1], ' ')))) AS g
  FROM (SELECT {ws.format(c='text')} AS ws FROM benchmark)
  WHERE len(ws) >= {n}
),
h AS (
  SELECT doc_id, count(*) AS n_hit_grams
  FROM dg JOIN bg USING (g) GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.doc_id IS NULL THEN NULL
            ELSE COALESCE(h.n_hit_grams, 0) END AS n_hit_grams,
       CASE WHEN d.doc_id IS NULL THEN NULL
            ELSE COALESCE(h.n_hit_grams > 0, FALSE) END AS contaminated
FROM (SELECT doc_id FROM documents) d
LEFT JOIN h ON h.doc_id = d.doc_id
"""

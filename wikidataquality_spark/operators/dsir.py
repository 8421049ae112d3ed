"""DSIR data selection: hashed n-gram importance resampling toward a target corpus.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling"): pick raw-corpus documents whose hashed n-gram distribution
looks like a TARGET corpus (curated text) rather than the raw crawl. Two
bag-of-grams models over B hash buckets — p̂ from the target, q̂ from the
raw corpus — give every document an importance log-weight

    log w(d) = Σ_{grams g∈d} [ log p̂(bucket(g)) − log q̂(bucket(g)) ]

and selection is sampling-without-replacement ∝ w via the Gumbel top-k
trick: select the k largest  log w + Gumbel(seed, id)  — distributionally
exact (Vieira 2014) and, with hashed noise, reproducible under retry and
repartition (the operators/sampling.py discipline: no RNG-stream
dependence, ever).

Scale design, in the house literal-artifact style (quality_model.py, pq.py):

  - The trained artifact is ONE length-B double vector (the bucket
    log-ratios, models/dsir_v1.json, B=8192 → 64 KB). It inlines into the
    plan as one array literal, so SCORING is a single codegen'd projection:
    grams hash to buckets (xxhash64 & (B−1), power-of-two mask — the
    operators/bloom.py ANSI-safe spelling), element_at into the literal,
    one left-fold sum. Zero shuffle, zero Python, zero join — at 100 TB the
    scorer free-rides on whatever scan already runs.
  - Unigram buckets fold straight over the per-word-hash array; bigram ids
    come from zip_with(wh, slice(wh, 2, …)) — both consume the array as a
    DIRECT child, so nothing re-evaluates the word-hash build per element
    (the textstats.py element_at-inlining hazard needs no barrier here).
  - Gumbel keys are hashed uniforms: u = ((xxhash64(seed, id) & (2⁵³−1)) +
    0.5) / 2⁵³ ∈ (0,1), g = −ln(−ln u). Top-k is orderBy(desc).limit(k) —
    TakeOrderedAndProject, per-partition heaps, no global sort.
  - Training (tools/train_dsir.py) is explode → B-bounded groupBy count —
    the aggregation state is B rows per partition regardless of corpus
    size — run once per target definition, versioned like every model here.

NULL text scores NULL (no grams ⇒ no evidence; the quality_model NULL
convention) and never enters a top-k. ref≈ the reference's OneOf/Range
"value conforms to a reference set" ethos recast distributionally: instead
of a per-row allowed-list, the whole corpus is steered toward a reference
distribution.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.operators.heuristics import words_col

DSIR_V1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models",
    "dsir_v1.json",
)

_M53 = (1 << 53) - 1
_TWO53 = float(1 << 53)


def _check_b(b: int) -> None:
    if b < 2 or (b & (b - 1)) != 0:
        raise ValueError(f"n_buckets must be a power of two ≥ 2, got {b}")


def gram_buckets(text: Column, n_buckets: int) -> Column:
    """array<long> of hash buckets for every unigram AND bigram of `text`
    (the paper's feature set), bucket = xxhash64(gram) & (B−1). NULL text →
    NULL. Word hashes are the shared per-word xxhash64 representation; the
    bigram id is xxhash64(h(wᵢ), h(wᵢ₊₁)) — the textstats.hashed_gram_ids
    n=2 spelling, built with zip_with so the word-hash array is evaluated
    once per row, not once per element."""
    _check_b(n_buckets)
    mask = F.lit(n_buckets - 1).cast("long")
    # split(trim('')) yields [''] — drop empty tokens so a blank document
    # has NO grams (score 0) instead of one phantom empty-string unigram
    words = F.filter(words_col(text), lambda w: F.length(w) > 0)
    wh = F.transform(words, lambda w: F.xxhash64(w))
    uni = F.transform(wh, lambda h: F.xxhash64(h).bitwiseAND(mask))
    bi = F.when(
        F.size(wh) >= 2,
        F.zip_with(
            F.slice(wh, 1, F.size(wh) - 1),
            F.slice(wh, 2, F.size(wh) - 1),
            lambda a, b: F.xxhash64(a, b).bitwiseAND(mask),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.when(text.isNotNull(), F.concat(uni, bi))


def load_dsir_model(path: str = DSIR_V1) -> dict:
    """Versioned train-once artifact: {'version', 'n_buckets', 'logratio':
    [B doubles], 'alpha', 'target', 'n_target_grams', 'n_raw_grams'}. JSON
    doubles round-trip at repr precision, so the plan literal and any test
    mirror decode identical IEEE values."""
    with open(path) as f:
        art = json.load(f)
    _check_b(int(art["n_buckets"]))
    if len(art["logratio"]) != int(art["n_buckets"]):
        raise ValueError("dsir artifact logratio length != n_buckets — retrain")
    return art


def dsir_logweight_col(text: Column, art: dict) -> Column:
    """Σ logratio[bucket(g)] over the document's grams as ONE projection —
    left fold in gram order, so a mirror summing in the same order matches
    to float associativity exactly."""
    lr = F.lit([float(v) for v in art["logratio"]])
    buckets = gram_buckets(text, int(art["n_buckets"]))
    return F.aggregate(
        buckets,
        F.lit(0.0),
        # bucket ∈ [0, B) by construction, +1 for 1-based element_at — never
        # out of bounds, so ANSI mode cannot raise here
        lambda acc, b: acc + F.element_at(lr, (b + F.lit(1).cast("long")).cast("int")),
    )


def gumbel_key_col(id_col: Column, seed: int) -> Column:
    """Deterministic per-id Gumbel(0,1): hashed 53-bit uniform in (0,1)
    (half-offset keeps u strictly inside, so neither log can hit ±inf),
    g = −ln(−ln u). Changing `seed` redraws the whole sample; retry,
    repartition, and re-run never do."""
    u = (
        F.xxhash64(F.lit(int(seed)), id_col).bitwiseAND(F.lit(_M53).cast("long")).cast("double")
        + F.lit(0.5)
    ) / F.lit(_TWO53)
    return -F.log(-F.log(u))


def with_dsir_logweight(
    df: DataFrame, text_col: str = "text", art: dict | None = None
) -> DataFrame:
    """Append `dsir_logweight` (NULL for NULL text)."""
    art = art or load_dsir_model()
    return df.withColumn("dsir_logweight", dsir_logweight_col(F.col(text_col), art))


def dsir_gumbel_topk(
    df: DataFrame,
    k: int,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    art: dict | None = None,
) -> DataFrame:
    """The k-document importance-resampled selection: (id, dsir_logweight,
    gumbel_key), the k largest logweight+gumbel. Exact sampling without
    replacement ∝ exp(logweight); TakeOrderedAndProject — the only thing
    that ever reaches the driver is k rows. NULL-id / NULL-text rows carry
    no usable key and are excluded BEFORE the ordering (a NULL key could
    otherwise displace a real document in NULLS LAST ordering dialects)."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    art = art or load_dsir_model()
    scored = df.select(
        F.col(id_col),
        dsir_logweight_col(F.col(text_col), art).alias("dsir_logweight"),
        gumbel_key_col(F.col(id_col), seed).alias("_g"),
    ).filter(F.col(id_col).isNotNull() & F.col("dsir_logweight").isNotNull())
    return (
        scored.withColumn("gumbel_key", F.col("dsir_logweight") + F.col("_g"))
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
        .select(id_col, "dsir_logweight", "gumbel_key")
    )

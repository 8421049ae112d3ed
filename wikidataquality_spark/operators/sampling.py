"""Deterministic stratified sampling (curriculum / data-mixture weighting).

Training-data pipelines don't use df.sample(): its decisions depend on
partitioning and RNG stream position, so a retry, a repartition, or an AQE
re-plan silently changes WHICH documents are sampled. Here the decision is a
pure function of (seed, id): u = pmod(xxhash64(seed, id), 2³¹)/2³¹, keep iff
u < rate(stratum). Consequences a mixture pipeline actually relies on:

  - reproducible: the same ids are kept on any cluster, any partitioning,
    any retry — a re-run of one failed partition samples identically;
  - NESTED: for one seed, the rate-0.1 sample is a strict subset of the
    rate-0.3 sample (same u, higher threshold) — upsampling a source for a
    new mixture keeps every previously-selected document, so ablation runs
    differ only by the delta;
  - independent across seeds: a fresh seed draws a fresh sample.

Spark's own sampleBy offers per-stratum fractions but keeps the
partition-dependent RNG; this trades its Bernoulli exactness guarantees for
determinism — at corpus scale the binomial deviation is negligible
(±3·√(N·r)/N ≈ ±0.1% at N=10⁷, r=0.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 31


def sample_unit(id_col: str | Column, seed: int = 0) -> Column:
    """Deterministic u ∈ [0,1) per id: pmod(xxhash64(seed, id), 2³¹)/2³¹.
    The leading seed literal changes the xxhash64 fold seed (the dedup
    double-hash trick), so distinct seeds give independent draws. NULL id →
    NULL (xxhash64 skips NULL children, which would give every NULL-id row
    ONE shared constant draw — callers must not sample unidentified rows)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.when(
        col.isNotNull(), F.pmod(F.xxhash64(F.lit(seed), col), F.lit(_BUCKETS))
    )
    return h / F.lit(float(_BUCKETS))


def stratified_sample_marks(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Adds `sample_u` (the deterministic draw) and boolean `sampled`:
    u < rates[stratum] (default_rate for unlisted or NULL strata). Rows with
    NULL id draw NULL u and are NEVER sampled (flag them upstream instead).
    Scrub-not-drop: every row survives; mixtures filter on `sampled`.

    The rate lookup compiles to a literal CASE chain — strata are
    source/language-grained (dozens), never row-grained, so no join and no
    broadcast is needed."""
    # validated SEPARATELY — merging into one dict would let a real stratum
    # literally named "default" shadow (or be shadowed by) default_rate and
    # dodge the range check (r04 review)
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0,1], got {v}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    rate: Column = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    u = sample_unit(id_col, seed=seed)
    return df.withColumn("sample_u", u).withColumn(
        "sampled", F.coalesce(u < rate, F.lit(False))
    )

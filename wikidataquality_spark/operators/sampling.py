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


_MD5_BUCKETS = 1 << 32


def sample_unit_md5(id_col: str | Column, seed: int = 0) -> Column:
    """Cross-engine twin of sample_unit: u = first 8 hex digits of
    md5('{seed}:{id}') / 2³². Same determinism / nesting / per-seed
    independence properties, but recomputable OUTSIDE Spark (md5 is md5
    everywhere; xxhash64 exists only JVM-side) — the draw an audit or the
    DuckDB oracle can replay exactly: `('0x' || substr(md5(seed || ':' ||
    id), 1, 8))::UBIGINT / 4294967296.0`. Integer < 2³² is exact in a
    double and /2³² is a power-of-two scale, so the two engines' doubles
    are bit-identical. ~2× the cost of the xxhash64 draw (md5 is not
    codegen-free) — the default stays xxhash64; use this when the mixture
    decision must be verifiable off-cluster. NULL id → NULL, same policy."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat_ws(":", F.lit(str(seed)), col.cast("string"))
    h = F.when(
        col.isNotNull(),
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"),
    )
    return h / F.lit(float(_MD5_BUCKETS))


def sample_unit_md5_sql(id_expr: str, seed: int = 0) -> str:
    """DuckDB expression computing the identical u as sample_unit_md5."""
    return (
        f"(CASE WHEN {id_expr} IS NOT NULL THEN "
        f"('0x' || substr(md5('{seed}' || ':' || CAST({id_expr} AS VARCHAR)), 1, 8))::UBIGINT "
        f"/ 4294967296.0 END)"
    )


def stratified_sample_marks(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    draw: str = "xxhash64",
) -> DataFrame:
    """Adds `sample_u` (the deterministic draw) and boolean `sampled`:
    u < rates[stratum] (default_rate for unlisted or NULL strata). Rows with
    NULL id draw NULL u and are NEVER sampled (flag them upstream instead).
    Scrub-not-drop: every row survives; mixtures filter on `sampled`.

    draw='xxhash64' (default, fastest) or 'md5' (sample_unit_md5 — the
    off-cluster-replayable draw the DuckDB oracle recomputes exactly).

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
    if draw not in ("xxhash64", "md5"):
        raise ValueError(f"draw must be 'xxhash64' or 'md5', got {draw!r}")
    rate: Column = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    unit = sample_unit if draw == "xxhash64" else sample_unit_md5
    u = unit(id_col, seed=seed)
    return df.withColumn("sample_u", u).withColumn(
        "sampled", F.coalesce(u < rate, F.lit(False))
    )


def temperature_rates(
    stratum_sizes: dict[str, int],
    temperature: float,
    target_total: int | None = None,
) -> dict[str, float]:
    """Per-stratum keep rates for temperature-based mixture sampling — the
    multilingual/multi-source standard (mBERT/XLM-R's exponent-smoothed
    multinomial, α = 1/τ in some papers' notation): sampling probability
    p_s ∝ n_s^(1/τ), so τ=1 keeps natural proportions, τ→∞ flattens toward
    uniform, τ<1 sharpens toward the head.

    Returns keep RATES (fractions of each stratum) rather than
    probabilities: rate_s = target_s / n_s with target_s = p_s·T, scaled so
    no rate exceeds 1 (sampling without replacement cannot upsample — when
    the requested T would need rate>1 for some stratum, every rate is
    scaled down by the worst violation, preserving the mixture SHAPE; the
    returned total is then < T and a caller wanting exactly T should epoch
    the capped strata instead). target_total=None sizes the mixture to the
    largest T whose rates are all ≤ 1.

    Driver-side pure arithmetic over a dozens-sized dict — feeds
    stratified_sample_marks, which compiles the rates to a literal CASE
    chain; the corpus never shuffles for any of this.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    sizes = {s: n for s, n in stratum_sizes.items() if n > 0}
    if not sizes:
        return {}
    total = sum(sizes.values())
    w = {s: (n / total) ** (1.0 / temperature) for s, n in sizes.items()}
    z = sum(w.values())
    p = {s: wi / z for s, wi in w.items()}
    # largest feasible T: rate_s = p_s·T/n_s ≤ 1  ⇒  T ≤ min(n_s/p_s)
    t_max = min(sizes[s] / p[s] for s in sizes)
    t = t_max if target_total is None else min(float(target_total), t_max)
    return {s: min(p[s] * t / sizes[s], 1.0) for s in sizes}

"""Mergeable distinct-count sketches (HLL / Apache DataSketches, built into
Spark 4) — cardinality across RUNS without recounting anything.

Parity: the reference's statistics job recounts its violation table per run
(ref≈specials/SpecialConstraintReport.php summaries); a crawl pipeline
needs "how many distinct urls/hosts so far, across 100 monthly snapshots"
— and the only scalable answer is a MERGEABLE sketch artifact: each run
persists a few-KB binary per group, and any later question unions the
artifacts instead of re-scanning 100 crawls. `approx_count_distinct`
(HLL++) gives a NUMBER per query — it cannot be stored, merged across
runs, or re-grouped; `hll_sketch_agg` gives the sketch itself, and
hll_union_agg folds any set of them (associative, commutative, idempotent
— re-unioning the same run changes nothing, the exactly-once property
dedup state needs from its metrics too).

Scale design: the sketch column is a bounded binary (~2^lg_k bytes ≈ 4 KB
at the default lg_k 12, relative error ≈ 1.04/√2^lg_k ≈ 1.6%); the
per-run table is one row per group. Everything here is JVM-side aggregate
functions — zero Python, ordinary partial-agg shuffles of sketch-sized
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # ~4 KB sketches, ~1.6% relative standard error


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One (group, sketch) row per group — the per-run ARTIFACT a pipeline
    appends to its metrics table (binary column, a few KB). NULL keys are
    ignored by the sketch (document the convention: count them separately
    if they matter — xxhash-constant hazards don't arise here)."""
    grouped = df.groupBy(*(group_cols or []))
    return grouped.agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("distinct_sketch")
    )


def union_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Fold any collection of sketch rows (many runs, many partitions, any
    grouping) into per-group distinct estimates. Union is idempotent:
    re-folding a run already included does not move the estimate."""
    grouped = sketches.groupBy(*(group_cols or []))
    return grouped.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("distinct_estimate")
    )

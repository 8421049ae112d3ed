"""Symmetric / Inverse link-reciprocity checkers (SURVEY.md §2A #10-11).

Parity: SymmetricChecker (ref≈includes/ConstraintCheck/Checker/
SymmetricChecker.php:~30-100) demands that a statement `a —P→ b` is matched
by `b —P→ a` on the target entity; InverseChecker
(ref≈includes/ConstraintCheck/Checker/InverseChecker.php:~30-110) demands
`b —Q→ a` for a configured inverse property Q. The reference resolves the
target entity with a per-statement EntityLookup point read; the Spark-native
recast is ONE anti-join over the whole link table per rule — the lookup
becomes a shuffle-hash/broadcast equi-join on the swapped key pair, so
checking 10^12 links costs one shuffle of (src, dst) pairs, never N point
reads.

Both checkers emit CheckResult-shaped rows: every input link annotated with
a violation struct (rules/model.violation_struct_type) whose status is
compliance|violation — the non-destructive flag pattern the rest of the rule
layer uses (dedup.dup_marks, rules/builder.apply_rules).

Scale notes (10^12 links / 1000 executors):
  - the probe side carries only (src, dst) — 16 bytes per link;
  - the existence probe is a left_semi/left_anti equi-join, which AQE turns
    into a broadcast when one side is a small dimension and a skew-split
    shuffle join otherwise;
  - a reciprocal-hub key (celebrity node with 10^8 in-links) skews the
    swapped-key shuffle — that is exactly the AQE skew-join case, same as
    dedup band buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.rules.model import COMPLIANCE, EXCEPTION, VIOLATION


# internal probe columns + the output struct column; inputs may not use them
_RESERVED = ("_gc_s", "_gc_d", "_gc_ok", "check")


def _reciprocity_check(
    links: DataFrame,
    probe_source: DataFrame,
    probe_src_col: str,
    probe_dst_col: str,
    src_col: str,
    dst_col: str,
    rule_id: str,
    detail: str,
) -> DataFrame:
    """Shared body of symmetric_check / inverse_check: build a DISTINCT
    swapped-pair probe from `probe_source`, left-join it onto `links` on
    (src, dst), and emit every input column + a CheckResult struct. Probe
    distinctness guarantees no row multiplication."""
    clash = [c for c in links.columns if c in _RESERVED]
    if clash:
        raise ValueError(
            f"reciprocity check: input columns {clash} collide with the "
            f"operator's reserved names {_RESERVED}; rename them first"
        )
    probe = (
        probe_source.select(
            F.col(probe_dst_col).alias("_gc_s"),
            F.col(probe_src_col).alias("_gc_d"),
        )
        .distinct()
        .withColumn("_gc_ok", F.lit(True))
    )
    out = links.join(
        probe,
        (F.col(src_col) == F.col("_gc_s")) & (F.col(dst_col) == F.col("_gc_d")),
        "left",
    ).withColumn("_gc_ok", F.coalesce("_gc_ok", F.lit(False)))
    ok = F.col("_gc_ok")
    # NULL-endpoint links can never match the swapped-pair probe (NULL
    # equi-join key), so without this arm they'd all read 'violation' —
    # but the rule layer's convention for unverifiable inputs is EXCEPTION
    # (rules/library.py: applicable = col IS NOT NULL; model.py folds the
    # reference's not-applicable the same way). Unkeyable links are excused,
    # not counted as broken reciprocity (r04 review).
    applicable = F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
    return out.select(
        *links.columns,
        F.struct(
            F.lit(rule_id).alias("rule"),
            F.when(~applicable, EXCEPTION)
            .when(ok, COMPLIANCE)
            .otherwise(VIOLATION)
            .alias("status"),
            F.when(~applicable, F.lit(None).cast("double"))
            .when(ok, 1.0)
            .otherwise(0.0)
            .alias("score"),
            F.when(~applicable, F.lit("NULL link endpoint — reciprocity unverifiable"))
            .when(ok, F.lit(None).cast("string"))
            .otherwise(F.lit(detail))
            .alias("detail"),
        ).alias("check"),
    )


def symmetric_check(
    links: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rule_id: str = "symmetric.link",
) -> DataFrame:
    """Annotate EVERY input row (a→b) — multiplicity and extra columns
    (statement ids, ranks, …) preserved, the same non-destructive flag shape
    as dedup.dup_marks — with a symmetric-reciprocity CheckResult: violation
    unless (b→a) also exists in the same table. The existence probe is one
    DISTINCT swapped-pair build + one equi-join; probe distinctness
    guarantees no row multiplication. Output: every input column + check."""
    return _reciprocity_check(
        links, links, src_col, dst_col, src_col, dst_col,
        rule_id, "no reciprocal link dst->src",
    )


def inverse_check(
    links: DataFrame,
    inverse_links: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    inv_src_col: str = "src",
    inv_dst_col: str = "dst",
    rule_id: str = "inverse.link",
) -> DataFrame:
    """Annotate EVERY input row (a —P→ b) — multiplicity and extra columns
    preserved, as in symmetric_check — with an inverse-property CheckResult:
    violation unless (b —Q→ a) exists in `inverse_links` (the configured
    inverse-property statement table). Same single-equi-join shape as
    symmetric_check, probing the OTHER table."""
    return _reciprocity_check(
        links, inverse_links, inv_src_col, inv_dst_col, src_col, dst_col,
        rule_id, "no inverse-property link dst->src",
    )

"""Rule library: rule_type → Column-expression factory.

Parity map (every factory names the reference checker it recasts; paths are
reconstructed, SURVEY.md §2A):

  format          ≈ Checker/FormatChecker.php:~30-110   (regex on string value)
  one_of          ≈ Checker/OneOfChecker.php:~30-100    (value ∈ allowed set)
  range           ≈ Checker/RangeChecker.php:~30-140    (value ∈ [min,max])
  diff_range      ≈ Checker/DiffWithinRangeChecker.php:~30-130
  single_value    ≈ Checker/SingleValueChecker.php:~30-80  (within-doc repetition)
  multi_value     ≈ Checker/MultiValueChecker.php:~30-80   (minimum content)
  conflicts_with  ≈ Checker/ConflictsWithChecker.php:~30-110 (blocklist)
  mandatory       ≈ Checker/MandatoryQualifiersChecker.php:~30-90 (non-null field)
  item_cooccur    ≈ Checker/ItemChecker.php:~30-100     (column co-occurrence)
  qualifiers      ≈ Checker/QualifiersChecker.php:~30-90 (array ⊆ whitelist)
  url_wellformed  ≈ Checker/CommonsLinkChecker.php:~30-110 (well-formed link)

Each factory takes a Rule (params is a str→str map, parsed here — the same
dynamic-parameters pattern as ref≈Helper/ConstraintParameterParser.php) and
returns a CheckResult struct Column. Cross-row rules (unique_value ≈
Checker/UniqueValueChecker.php) can't be a per-row expression; they live in
operators/dedup.py and are stitched in by the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from wikidataquality_spark.rules.model import Rule, check_result


def _split_list(raw: str | None) -> list[str]:
    return [v for v in (raw or "").split(",") if v]


def format_rule(rule: Rule) -> Column:
    """String column must (or must not) match a regex parameter."""
    col = F.col(rule.param("column", "text"))
    pattern = rule.param("pattern")
    if pattern is None:
        raise ValueError(f"format rule {rule.rule_id} needs a 'pattern' param")
    matched = col.rlike(pattern)
    passed = ~matched if rule.param("mode", "must_not_match") == "must_not_match" else matched
    return check_result(rule, passed, applicable=col.isNotNull())


def one_of_rule(rule: Rule) -> Column:
    col = F.col(rule.param("column", "lang"))
    allowed = _split_list(rule.param("allowed"))
    return check_result(rule, col.isin(allowed), applicable=col.isNotNull())


def range_rule(rule: Rule) -> Column:
    col = F.col(rule.param("column")).cast("double")
    lo, hi = rule.fparam("min", float("-inf")), rule.fparam("max", float("inf"))
    return check_result(
        rule, col.between(lo, hi), score=col, applicable=col.isNotNull()
    )


def diff_range_rule(rule: Rule) -> Column:
    diff = (
        F.col(rule.param("column_a")).cast("double")
        - F.col(rule.param("column_b")).cast("double")
    )
    lo, hi = rule.fparam("min", float("-inf")), rule.fparam("max", float("inf"))
    return check_result(rule, diff.between(lo, hi), score=diff, applicable=diff.isNotNull())


def single_value_rule(rule: Rule) -> Column:
    """Within-doc repetition: distinct-token ratio must be ≥ min."""
    col = F.col(rule.param("column", "distinct_word_ratio_stat")).cast("double")
    lo = rule.fparam("min", 0.0)
    return check_result(rule, col >= lo, score=col, applicable=col.isNotNull())


def multi_value_rule(rule: Rule) -> Column:
    """Minimum content: token count ≥ k."""
    col = F.col(rule.param("column", "n_words_stat")).cast("double")
    k = rule.fparam("min", 1.0)
    return check_result(rule, col >= k, score=col, applicable=col.isNotNull())


def conflicts_with_rule(rule: Rule) -> Column:
    """Blocklist: violation when any blocked term appears (word-boundary)."""
    col = F.col(rule.param("column", "text"))
    terms = _split_list(rule.param("blocked"))
    if not terms:
        raise ValueError(f"conflicts_with rule {rule.rule_id} needs 'blocked'")
    pattern = r"\b(" + "|".join(terms) + r")\b"
    return check_result(rule, ~col.rlike(pattern), applicable=col.isNotNull())


def mandatory_rule(rule: Rule) -> Column:
    col = F.col(rule.param("column"))
    present = col.isNotNull() & (F.length(col.cast("string")) > 0)
    return check_result(rule, present)


def item_cooccur_rule(rule: Rule) -> Column:
    """If column_a is present, column_b must be too (ItemChecker recast)."""
    a, b = F.col(rule.param("column_a")), F.col(rule.param("column_b"))
    return check_result(rule, b.isNotNull(), applicable=a.isNotNull())


def qualifiers_rule(rule: Rule) -> Column:
    """Array column may contain ONLY whitelisted values (QualifiersChecker
    recast, ref≈Checker/QualifiersChecker.php:~30-90): violation when
    array_except(values, allowed) is non-empty."""
    col = F.col(rule.param("column"))
    allowed = _split_list(rule.param("allowed"))
    extras = F.array_except(col, F.array(*[F.lit(v) for v in allowed]))
    return check_result(
        rule,
        F.size(extras) == 0,
        detail=F.array_join(extras, ","),
        applicable=col.isNotNull(),
    )


def url_wellformed_rule(rule: Rule) -> Column:
    """URL must parse: http(s) scheme + a dotted, extractable host
    (CommonsLinkChecker recast, ref≈Checker/CommonsLinkChecker.php:~30-110 —
    'string must be a well-formed link')."""
    col = F.col(rule.param("column", "url"))
    host = F.parse_url(col, F.lit("HOST"))
    ok = col.rlike(r"^https?://") & host.isNotNull() & host.contains(".")
    return check_result(rule, ok, detail=host, applicable=col.isNotNull())


def flag_rule(rule: Rule) -> Column:
    """Boolean flag column must be false (bridges cross-row ops — dup marks
    from operators/dedup.py — into the per-row violation framework; this is
    how UniqueValueChecker's cross-entity verdict re-enters the CheckResult
    stream, SURVEY §2A#7)."""
    col = F.col(rule.param("column"))
    return check_result(rule, ~col, applicable=col.isNotNull())


RULE_FACTORIES: dict[str, Callable[[Rule], Column]] = {
    "flag": flag_rule,
    "format": format_rule,
    "one_of": one_of_rule,
    "range": range_rule,
    "diff_range": diff_range_rule,
    "single_value": single_value_rule,
    "multi_value": multi_value_rule,
    "conflicts_with": conflicts_with_rule,
    "mandatory": mandatory_rule,
    "item_cooccur": item_cooccur_rule,
    "qualifiers": qualifiers_rule,
    "url_wellformed": url_wellformed_rule,
}

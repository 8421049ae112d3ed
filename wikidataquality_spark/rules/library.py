"""Rule library: rule_type → CheckExpr (SQL-fragment) factory.

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
returns a CheckExpr of SQL fragments; rules/builder.py compiles the whole
set into a handful of F.expr columns (why strings: model.CheckExpr — the
Column-per-subexpression version cost ~1.3s of py4j driver-serial time per
plan). Cross-row rules (unique_value ≈ Checker/UniqueValueChecker.php) can't
be a per-row expression; they live in operators/dedup.py and are stitched in
by the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from wikidataquality_spark.rules.model import (
    CheckExpr,
    Rule,
    check_result_sql,
    sql_double,
    sql_ident,
    sql_str,
)


def _split_list(raw: str | None) -> list[str]:
    return [v for v in (raw or "").split(",") if v]


def format_rule(rule: Rule) -> CheckExpr:
    """String column must (or must not) match a regex parameter."""
    col = sql_ident(rule.param("column", "text"))
    pattern = rule.param("pattern")
    if pattern is None:
        raise ValueError(f"format rule {rule.rule_id} needs a 'pattern' param")
    matched = f"({col} RLIKE {sql_str(pattern)})"
    mode = rule.param("mode", "must_not_match")
    if mode not in ("must_match", "must_not_match"):
        # a typo'd mode would otherwise silently INVERT the rule (anything
        # != 'must_not_match' fell through to must_match — r04 review)
        raise ValueError(f"format rule {rule.rule_id}: unknown mode {mode!r}")
    passed = f"NOT {matched}" if mode == "must_not_match" else matched
    return check_result_sql(rule, passed, applicable=f"({col} IS NOT NULL)")


def one_of_rule(rule: Rule) -> CheckExpr:
    col = sql_ident(rule.param("column", "lang"))
    allowed = _split_list(rule.param("allowed"))
    if not allowed:
        # loud, like format/conflicts_with: an empty or mistyped 'allowed'
        # would otherwise compile to passed=FALSE and silently drop every
        # document with a non-NULL column (r04 review)
        raise ValueError(f"one_of rule {rule.rule_id} needs a non-empty 'allowed'")
    passed = f"({col} IN ({', '.join(sql_str(v) for v in allowed)}))"
    return check_result_sql(rule, passed, applicable=f"({col} IS NOT NULL)")


def range_rule(rule: Rule) -> CheckExpr:
    # TRY_CAST (valid in both Spark SQL and the DuckDB oracle dialect), not
    # CAST: under Spark 4's default ANSI mode one non-numeric value in the
    # column would raise CAST_INVALID_INPUT and abort the whole job — and
    # the `applicable = col IS NOT NULL` clause below proves the DESIGN is
    # cast-failure -> exception status, a path plain CAST makes unreachable
    # (r04 review; same reasoning as host_of's try_parse_url)
    col = f"TRY_CAST({sql_ident(rule.param('column'))} AS DOUBLE)"
    lo, hi = rule.fparam("min", float("-inf")), rule.fparam("max", float("inf"))
    return check_result_sql(
        rule,
        f"({col} BETWEEN {sql_double(lo)} AND {sql_double(hi)})",
        score=col,
        applicable=f"({col} IS NOT NULL)",
    )


def diff_range_rule(rule: Rule) -> CheckExpr:
    # TRY_CAST for ANSI totality — see range_rule
    diff = (
        f"(TRY_CAST({sql_ident(rule.param('column_a'))} AS DOUBLE) - "
        f"TRY_CAST({sql_ident(rule.param('column_b'))} AS DOUBLE))"
    )
    lo, hi = rule.fparam("min", float("-inf")), rule.fparam("max", float("inf"))
    return check_result_sql(
        rule,
        f"({diff} BETWEEN {sql_double(lo)} AND {sql_double(hi)})",
        score=diff,
        applicable=f"({diff} IS NOT NULL)",
    )


def single_value_rule(rule: Rule) -> CheckExpr:
    """Within-doc repetition: distinct-token ratio must be ≥ min."""
    col = f"TRY_CAST({sql_ident(rule.param('column', 'distinct_word_ratio_stat'))} AS DOUBLE)"
    lo = rule.fparam("min", 0.0)
    return check_result_sql(
        rule,
        f"({col} >= {sql_double(lo)})",
        score=col,
        applicable=f"({col} IS NOT NULL)",
    )


def multi_value_rule(rule: Rule) -> CheckExpr:
    """Minimum content: token count ≥ k."""
    col = f"TRY_CAST({sql_ident(rule.param('column', 'n_words_stat'))} AS DOUBLE)"
    k = rule.fparam("min", 1.0)
    return check_result_sql(
        rule,
        f"({col} >= {sql_double(k)})",
        score=col,
        applicable=f"({col} IS NOT NULL)",
    )


def conflicts_with_rule(rule: Rule) -> CheckExpr:
    """Blocklist: violation when any blocked term appears (word-boundary)."""
    col = sql_ident(rule.param("column", "text"))
    terms = _split_list(rule.param("blocked"))
    if not terms:
        raise ValueError(f"conflicts_with rule {rule.rule_id} needs 'blocked'")
    # 'blocked' is a TERM list, not a regex (format_rule takes the regex):
    # escape metacharacters so 'c++' doesn't throw PatternSyntaxException at
    # execution and 'a.b' doesn't silently match 'aXb'. Lookarounds, not \b:
    # \b needs a word char on the inside, so '\b(c\+\+)\b' could never match
    # 'c++ ' — (?<!\w)/(?!\w) are equivalent for word-char terms and correct
    # for terms that start or end with symbols
    import re as _re

    pattern = r"(?<!\w)(" + "|".join(_re.escape(t) for t in terms) + r")(?!\w)"
    return check_result_sql(
        rule,
        f"NOT ({col} RLIKE {sql_str(pattern)})",
        applicable=f"({col} IS NOT NULL)",
    )


def mandatory_rule(rule: Rule) -> CheckExpr:
    col = sql_ident(rule.param("column"))
    present = f"(({col} IS NOT NULL) AND (length(CAST({col} AS STRING)) > 0))"
    return check_result_sql(rule, present)


def item_cooccur_rule(rule: Rule) -> CheckExpr:
    """If column_a is present, column_b must be too (ItemChecker recast)."""
    a = sql_ident(rule.param("column_a"))
    b = sql_ident(rule.param("column_b"))
    return check_result_sql(
        rule, f"({b} IS NOT NULL)", applicable=f"({a} IS NOT NULL)"
    )


def qualifiers_rule(rule: Rule) -> CheckExpr:
    """Array column may contain ONLY whitelisted values (QualifiersChecker
    recast, ref≈Checker/QualifiersChecker.php:~30-90): violation when
    array_except(values, allowed) is non-empty."""
    col = sql_ident(rule.param("column"))
    allowed = _split_list(rule.param("allowed"))
    if not allowed:
        # loud, like one_of/format: an empty or mistyped 'allowed' would
        # otherwise compile to array_except(col, array()) and silently flag
        # every doc with a non-empty array as a violation (r04 review)
        raise ValueError(f"qualifiers rule {rule.rule_id} needs a non-empty 'allowed'")
    arr = f"array({', '.join(sql_str(v) for v in allowed)})"
    extras = f"array_except({col}, {arr})"
    return check_result_sql(
        rule,
        f"(size({extras}) = 0)",
        detail=f"array_join({extras}, ',')",
        applicable=f"({col} IS NOT NULL)",
    )


def url_wellformed_rule(rule: Rule) -> CheckExpr:
    """URL must parse: http(s) scheme + a dotted, extractable host
    (CommonsLinkChecker recast, ref≈Checker/CommonsLinkChecker.php:~30-110 —
    'string must be a well-formed link')."""
    col = sql_ident(rule.param("column", "url"))
    # try_parse_url: under ANSI mode plain parse_url THROWS on a malformed
    # URL — the rule must mark it a violation, not abort the job
    host = f"try_parse_url({col}, 'HOST')"
    ok = (
        f"(({col} RLIKE '^https?://') AND ({host} IS NOT NULL) "
        f"AND contains({host}, '.'))"
    )
    return check_result_sql(
        rule, ok, detail=host, applicable=f"({col} IS NOT NULL)"
    )


def flag_rule(rule: Rule) -> CheckExpr:
    """Boolean flag column must be false (bridges cross-row ops — dup marks
    from operators/dedup.py — into the per-row violation framework; this is
    how UniqueValueChecker's cross-entity verdict re-enters the CheckResult
    stream, SURVEY §2A#7)."""
    col = sql_ident(rule.param("column"))
    return check_result_sql(
        rule, f"(NOT {col})", applicable=f"({col} IS NOT NULL)"
    )


RULE_FACTORIES: dict[str, Callable[[Rule], CheckExpr]] = {
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

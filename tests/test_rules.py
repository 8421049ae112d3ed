"""Per-rule unit tests — one scenario block per checker, mirroring the
reference's one-PHPUnit-class-per-checker layout
(ref≈tests/phpunit/ConstraintCheck/Checker/*Test.php, SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.rules.builder import apply_rules, rule_check_column
from wikidataquality_spark.rules.model import COMPLIANCE, EXCEPTION, VIOLATION, Rule


def _statuses(spark, rows, schema, rule):
    df = spark.createDataFrame(rows, schema)
    out = df.select(rule_check_column(rule).alias("r")).select("r.status").collect()
    return [r["status"] for r in out]


def test_range_rule(spark):
    rule = Rule("range.x", "range", {"column": "x", "min": "3", "max": "10"})
    assert _statuses(spark, [(5.0,), (2.9,), (10.0,), (None,)], "x double", rule) == [
        COMPLIANCE,
        VIOLATION,
        COMPLIANCE,
        EXCEPTION,
    ]


def test_one_of_rule(spark):
    rule = Rule("one_of.lang", "one_of", {"column": "lang", "allowed": "en,fr"})
    assert _statuses(spark, [("en",), ("de",), (None,)], "lang string", rule) == [
        COMPLIANCE,
        VIOLATION,
        EXCEPTION,
    ]


def test_format_rule_must_not_match(spark):
    rule = Rule(
        "format.pii", "format", {"column": "t", "pattern": r"\d{3}-\d{4}", "mode": "must_not_match"}
    )
    assert _statuses(spark, [("call 555-1234",), ("clean",)], "t string", rule) == [
        VIOLATION,
        COMPLIANCE,
    ]


def test_format_rule_must_match(spark):
    rule = Rule(
        "format.url", "format", {"column": "t", "pattern": r"^https?://", "mode": "must_match"}
    )
    assert _statuses(spark, [("https://x.org",), ("ftp://x",)], "t string", rule) == [
        COMPLIANCE,
        VIOLATION,
    ]


def test_diff_range_rule(spark):
    rule = Rule("diff.ab", "diff_range", {"column_a": "a", "column_b": "b", "min": "0", "max": "5"})
    assert _statuses(
        spark, [(10.0, 7.0), (7.0, 10.0), (None, 1.0)], "a double, b double", rule
    ) == [COMPLIANCE, VIOLATION, EXCEPTION]


def test_conflicts_with_rule(spark):
    rule = Rule("cw.bad", "conflicts_with", {"column": "t", "blocked": "badword,worse"})
    assert _statuses(
        spark,
        [("a badword here",), ("a badwording ok",), ("clean text",)],
        "t string",
        rule,
    ) == [VIOLATION, COMPLIANCE, COMPLIANCE]


def test_conflicts_with_rule_escapes_regex_metacharacters(spark):
    """'blocked' is a TERM list from arbitrary config, not a regex: 'c++'
    must not throw PatternSyntaxException at execution and 'a.b' must not
    match 'aXb' (regression for the r03 review finding)."""
    rule = Rule("cw.meta", "conflicts_with", {"column": "t", "blocked": "c++,a.b"})
    assert _statuses(
        spark,
        [("uses c++ daily",), ("the aXb protocol",), ("the a.b protocol",)],
        "t string",
        rule,
    ) == [VIOLATION, COMPLIANCE, VIOLATION]


def test_mandatory_rule(spark):
    rule = Rule("mand.u", "mandatory", {"column": "u"})
    assert _statuses(spark, [("x",), ("",), (None,)], "u string", rule) == [
        COMPLIANCE,
        VIOLATION,
        VIOLATION,
    ]


def test_item_cooccur_rule(spark):
    rule = Rule("item.ab", "item_cooccur", {"column_a": "a", "column_b": "b"})
    assert _statuses(
        spark,
        [("x", "y"), ("x", None), (None, None)],
        "a string, b string",
        rule,
    ) == [COMPLIANCE, VIOLATION, EXCEPTION]


def test_unknown_rule_type_raises():
    with pytest.raises(ValueError, match="unknown rule_type"):
        rule_check_column(Rule("x", "nope", {}))


def test_apply_rules_keep_and_violated(spark):
    rules = [
        Rule("r.range", "range", {"column": "x", "min": "0", "max": "10"}),
        Rule("r.soft", "range", {"column": "x", "min": "5", "max": "10"}, severity="soft"),
    ]
    df = spark.createDataFrame([(3.0,), (12.0,)], "x double")
    out = apply_rules(df, rules).select("keep", "violated_rules").collect()
    # row 1: hard passes, soft fails → keep=True but violated_rules lists the soft one
    assert out[0]["keep"] is True
    assert out[0]["violated_rules"] == ["r.soft"]
    # row 2: hard fails → dropped
    assert out[1]["keep"] is False
    assert set(out[1]["violated_rules"]) == {"r.range", "r.soft"}


def test_exception_does_not_drop(spark):
    rules = [Rule("r.range", "range", {"column": "x", "min": "0", "max": "10"})]
    df = spark.createDataFrame([(None,)], "x double")
    out = apply_rules(df, rules).select("keep").collect()
    assert out[0]["keep"] is True


def test_qualifiers_rule(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "x"]), (3, None)],
        "id long, quals array<string>",
    )
    out = apply_rules(df, [Rule("q.whitelist", "qualifiers", {"column": "quals", "allowed": "a,b,c"})])
    rows = {r["id"]: (r["keep"], r["violations"][0]["status"]) for r in out.collect()}
    assert rows[1] == (True, "compliance")
    assert rows[2][1] == "violation" and rows[2][0] is False
    assert rows[3][1] == "exception" and rows[3][0] is True  # NULL → not applicable


def test_url_wellformed_rule(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/p/1"),
            (2, "ftp://example.com/x"),
            (3, "https://nohost"),
            (4, None),
        ],
        "id long, url string",
    )
    out = apply_rules(df, [Rule("u.wf", "url_wellformed", {"column": "url"})])
    rows = {r["id"]: r["violations"][0]["status"] for r in out.collect()}
    assert rows[1] == "compliance"
    assert rows[2] == "violation"
    assert rows[3] == "violation"
    assert rows[4] == "exception"


def test_symmetric_inverse_checks(spark):
    from wikidataquality_spark.operators.graphcheck import (
        inverse_check,
        symmetric_check,
    )

    links = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4)], "src long, dst long"
    )
    sym = {
        (r["src"], r["dst"]): r["check"]["status"]
        for r in symmetric_check(links).collect()
    }
    assert sym[(1, 2)] == "compliance" and sym[(2, 1)] == "compliance"
    assert sym[(3, 4)] == "violation"

    inv_links = spark.createDataFrame([(4, 3)], "src long, dst long")
    inv = {
        (r["src"], r["dst"]): r["check"]["status"]
        for r in inverse_check(links, inv_links).collect()
    }
    assert inv[(3, 4)] == "compliance"
    assert inv[(1, 2)] == "violation" and inv[(2, 1)] == "violation"
    # violation rows carry the CheckResult detail; compliant rows don't
    det = {
        (r["src"], r["dst"]): r["check"]["detail"]
        for r in inverse_check(links, inv_links).collect()
    }
    assert det[(3, 4)] is None and det[(1, 2)] is not None

    # EVERY input row is annotated: duplicate (src,dst) pairs keep their
    # multiplicity and per-statement columns ride through untouched
    stmts = spark.createDataFrame(
        [(1, 2, "s1"), (1, 2, "s2"), (2, 1, "s3"), (3, 4, "s4")],
        "src long, dst long, statement_id string",
    )
    out = symmetric_check(stmts).collect()
    assert len(out) == 4
    by_stmt = {r["statement_id"]: r["check"]["status"] for r in out}
    assert by_stmt == {
        "s1": "compliance",
        "s2": "compliance",
        "s3": "compliance",
        "s4": "violation",
    }
    inv_out = inverse_check(stmts, inv_links).collect()
    assert len(inv_out) == 4
    assert {r["statement_id"] for r in inv_out} == {"s1", "s2", "s3", "s4"}

    # reserved-name collisions fail loudly at plan time instead of raising
    # AMBIGUOUS_REFERENCE mid-join or silently shadowing the output struct
    tainted = spark.createDataFrame(
        [(1, 2, True)], "src long, dst long, check boolean"
    )
    with pytest.raises(ValueError, match="reserved"):
        symmetric_check(tainted)


def test_sql_literal_escaping_quotes_and_backslashes(spark):
    """The SQL-string rule compiler must round-trip hostile param values:
    single quotes and backslashes in patterns/values, backticks in column
    names (rules come from a CSV config table — arbitrary strings)."""
    # regex with backslash classes and a quote — \b must survive the parser
    rule = Rule(
        "fmt.q", "format",
        {"column": "t", "pattern": r"\bo'clock\b", "mode": "must_not_match"},
    )
    assert _statuses(
        spark, [("at 5 o'clock",), ("clean text",), (None,)], "t string", rule
    ) == [VIOLATION, COMPLIANCE, EXCEPTION]

    # allowed-value containing a quote
    rule = Rule("one.q", "one_of", {"column": "t", "allowed": "it's,ok"})
    assert _statuses(spark, [("it's",), ("ok",), ("nope",)], "t string", rule) == [
        COMPLIANCE,
        COMPLIANCE,
        VIOLATION,
    ]

    # rule_id with a quote must survive into the struct and violated_rules
    rule = Rule("id'with'quotes", "mandatory", {"column": "t"})
    df = spark.createDataFrame([(None,)], "t string")
    row = apply_rules(df, [rule]).select("violations", "violated_rules").first()
    assert row["violations"][0]["rule"] == "id'with'quotes"
    assert row["violated_rules"] == ["id'with'quotes"]


def test_sql_identifier_escaping_backtick_column(spark):
    rule = Rule("m.bt", "mandatory", {"column": "weird`name"})
    df = spark.createDataFrame([("x",), (None,)], ["weird`name"])
    out = df.select(rule_check_column(rule)["status"].alias("s")).collect()
    assert [r["s"] for r in out] == [COMPLIANCE, VIOLATION]


def test_sql_identifier_dotted_param_resolves_nested_field(spark):
    """Column params kept F.col's nested-field semantics through the SQL-string
    compiler migration: a dotted param descends into a struct (regression for
    the r03 review finding that single-identifier quoting silently broke every
    dotted config at plan time)."""
    rule = Rule("m.nested", "mandatory", {"column": "check.score"})
    df = spark.createDataFrame(
        [((1.0,),), ((None,),)], "check struct<score double>"
    )
    out = df.select(rule_check_column(rule)["status"].alias("s")).collect()
    assert [r["s"] for r in out] == [COMPLIANCE, VIOLATION]


def test_qualifiers_rule_rejects_empty_allowed():
    """An empty or mistyped 'allowed' must fail loudly, not compile to
    array_except(col, array()) flagging every non-empty array (r04 review)."""
    import pytest

    from wikidataquality_spark.rules.builder import rule_check_expr
    from wikidataquality_spark.rules.model import Rule

    with pytest.raises(ValueError, match="non-empty 'allowed'"):
        rule_check_expr(Rule("q.bad", "qualifiers", {"column": "tags"}))


def test_graphcheck_null_endpoint_is_exception_not_violation(spark):
    """A link with a NULL endpoint can never match the swapped-pair probe,
    so it previously read 'violation'; the rule layer's convention for
    unverifiable inputs is 'exception' (r04 review)."""
    from wikidataquality_spark.operators.graphcheck import symmetric_check

    rows = [(1, 2), (2, 1), (3, None), (None, 4), (5, 6)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {
        (r["src"], r["dst"]): r["check"]["status"]
        for r in symmetric_check(df).collect()
    }
    assert got[(1, 2)] == "compliance" and got[(2, 1)] == "compliance"
    assert got[(3, None)] == "exception"
    assert got[(None, 4)] == "exception"
    assert got[(5, 6)] == "violation"

"""Report surface tests: the batch analogues of the reference's three
special pages (ref≈specials/Special{ConstraintReport,CrossCheck,
ExternalDbs}.php) — per-doc check tables, the entity-id point lookup, the
crosscheck comparison table, the dump listing, and the markdown render with
its driver-protecting row cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidataquality_spark.report import (
    constraint_report,
    constraint_report_for,
    crosscheck_report,
    external_dbs_report,
    render_markdown,
)
from wikidataquality_spark.rules.builder import apply_rules
from wikidataquality_spark.rules.model import Rule


def _validated(spark):
    df = spark.createDataFrame(
        [("u1", "en", 5.0), ("u2", "xx", 5.0), ("u3", "en", None)],
        "url string, lang string, score double",
    )
    rules = [
        Rule("one_of.lang", "one_of", {"column": "lang", "allowed": "en,fr"}),
        Rule("range.score", "range", {"column": "score", "min": "0", "max": "10"}),
    ]
    return apply_rules(df, rules)


def test_constraint_report_rows(spark):
    rep = constraint_report(_validated(spark))
    rows = {(r["url"], r["rule"]): r["status"] for r in rep.collect()}
    assert rows[("u1", "one_of.lang")] == "compliance"
    assert rows[("u2", "one_of.lang")] == "violation"
    assert rows[("u3", "range.score")] == "exception"  # NULL input
    assert len(rows) == 6  # every (doc, rule) pair reported


def test_constraint_report_point_lookup(spark):
    rep = constraint_report_for(_validated(spark), ["u2"])
    rows = rep.collect()
    assert {r["url"] for r in rows} == {"u2"}
    assert len(rows) == 2


def test_crosscheck_report_rows(spark):
    from wikidataquality_spark.operators.crosscheck import crosscheck

    checked = spark.createDataFrame(
        [(1, "alpha", 10.0)], "doc_id long, source string, n_chars double"
    )
    ext = spark.createDataFrame(
        [(1, "alpha", 11.0)], "doc_id long, ext_source string, ext_n_chars double"
    )
    out = crosscheck(
        checked,
        ext,
        on="doc_id",
        fields=[
            ("source", "ext_source", "string", {}),
            ("n_chars", "ext_n_chars", "quantity", {"abs_tol": 2.0}),
        ],
    )
    rep = {r["field"]: r for r in crosscheck_report(out).collect()}
    assert rep["source"]["status"] == "match"
    assert rep["n_chars"]["status"] == "partial"  # within tolerance
    assert rep["n_chars"]["checked_value"] == "10.0"


def test_external_dbs_and_markdown_render(spark):
    from wikidataquality_spark.operators.crosscheck import dump_meta_table

    meta = dump_meta_table(
        spark,
        [
            ("d2", "ext-mirror", "en", "cc-by", "2025-02-01"),
            ("d1", "ext-feed", "en", "cc0", "2025-01-01"),
        ],
    )
    listing = external_dbs_report(meta)
    assert [r["dump_id"] for r in listing.collect()] == ["d1", "d2"]

    md = render_markdown(listing, title="External databases")
    assert md.startswith("# External databases")
    assert "| d1 |" in md and "| d2 |" in md
    # the row cap protects the driver and is announced
    capped = render_markdown(constraint_report(_validated(spark)), max_rows=2)
    assert "truncated at 2 rows" in capped
    assert capped.count("\n| ") == 3  # header divider + 2 data rows


def test_render_markdown_escapes_pipes_and_newlines(spark):
    """Cell values from arbitrary documents must not break table structure."""
    from wikidataquality_spark.report import render_markdown

    df = spark.createDataFrame(
        # the third row's value contains a LITERAL backslash-pipe sequence:
        # without backslash-first escaping it renders '\\|' — an escaped
        # backslash followed by a LIVE pipe (r04 review)
        [("a|b", "line1\nline2"), ("plain", "x\r\ny"), ("back\\|slash", "z")],
        "k string, v string",
    )
    md = render_markdown(df)

    def live_pipes(ln: str) -> int:
        # a pipe is a live delimiter unless consumed by a preceding '\'
        n, i = 0, 0
        while i < len(ln):
            if ln[i] == "\\":
                i += 2
                continue
            if ln[i] == "|":
                n += 1
            i += 1
        return n

    body = [ln for ln in md.splitlines() if ln.startswith("|")][2:]
    # 2 columns = exactly 3 LIVE pipes per row
    assert all(live_pipes(ln) == 3 for ln in body)
    assert "a\\|b" in md and "line1 line2" in md
    assert "back\\\\\\|slash" in md  # \ → \\ then | → \|

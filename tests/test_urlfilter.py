"""Domain-blocklist gates: suffix semantics, most-specific match, NULL
policy, TLD exclusion, DuckDB-twin parity, and the plan shape (broadcast
equi-join, no nested loop)."""

from __future__ import annotations

import contextlib
import io

import duckdb
from pyspark.sql import functions as F

from wikidataquality_spark.operators.urlfilter import (
    domain_blocklist_marks,
    domain_chain,
)

DOCS = [
    (1, "https://a.b.example.com/page"),
    (2, "https://example.com/"),
    (3, "https://safe.org/x"),
    (4, "https://evil.example.org:8080/y"),
    (5, "not a url"),
    (6, None),
    (7, "https://com/"),          # host IS a bare tld-looking label
    (8, "https://sub.evil.example.org/z"),
]
BL = ["example.com", "evil.example.org", "EXAMPLE.ORG"]  # case-insensitive


def _marks(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, url string")
    bl = spark.createDataFrame([(d,) for d in BL], "domain string")
    return {
        r["doc_id"]: (r["blocked"], r["matched_domain"])
        for r in domain_blocklist_marks(docs, bl).collect()
    }


def test_suffix_semantics_and_most_specific(spark):
    m = _marks(spark)
    assert m[1] == (True, "example.com")       # parent-domain match
    assert m[2] == (True, "example.com")       # exact
    assert m[3] == (False, None)
    # evil.example.org AND example.org both match — most specific wins
    assert m[4] == (True, "evil.example.org")
    assert m[8] == (True, "evil.example.org")
    assert m[5] == (None, None)                # unparseable → unverifiable
    assert m[6] == (None, None)
    assert m[7] == (False, None)               # single-label 'com' host only
    # matches a literal 'com' ENTRY, which the list doesn't have


def test_bare_tld_entry_cannot_blank_corpus(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, url string")
    bl = spark.createDataFrame([("com",)], "domain string")
    m = {r["doc_id"]: r["blocked"] for r in domain_blocklist_marks(docs, bl).collect()}
    assert m[1] is False and m[2] is False     # multi-label hosts exclude the TLD
    assert m[7] is True                        # host literally 'com' matches itself


def test_duckdb_twin_parity(spark):
    """Same suffix algebra in DuckDB SQL over the same rows."""
    con = duckdb.connect()
    con.execute("CREATE TABLE bl AS SELECT lower(unnest(?::VARCHAR[])) AS domain", [BL])
    rows = [(i, u) for i, u in DOCS]
    con.execute("CREATE TABLE docs(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute("""
WITH hosts AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(url, '^https?://') THEN
           regexp_replace(lower(regexp_replace(regexp_replace(url, '^https?://', ''), '[:/].*$', '')), '\.$', '')
         END AS host
  FROM docs
), chains AS (
  SELECT doc_id, host,
         CASE WHEN host IS NULL THEN NULL
              WHEN len(string_split(host, '.')) < 2 THEN [host]
              ELSE [array_to_string(string_split(host, '.')[i:], '.')
                    FOR i IN range(greatest(1, len(string_split(host, '.')) - 9),
                                   len(string_split(host, '.')))]
         END AS chain
  FROM hosts
), hits AS (
  SELECT doc_id, max_by(d, length(d)) AS matched
  FROM (SELECT doc_id, unnest(chain) AS d FROM chains) c JOIN bl ON c.d = bl.domain
  GROUP BY doc_id
)
SELECT chains.doc_id,
       CASE WHEN chain IS NULL OR chains.doc_id IS NULL THEN NULL
            ELSE matched IS NOT NULL END,
       CASE WHEN chain IS NULL OR chains.doc_id IS NULL THEN NULL
            ELSE matched END
FROM chains LEFT JOIN hits ON chains.doc_id = hits.doc_id
""").fetchall()
    }
    got = _marks(spark)
    assert got == want, (got, want)


def test_plan_broadcast_no_nested_loop(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, url string")
    bl = spark.createDataFrame([(d,) for d in BL], "domain string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        domain_blocklist_marks(docs, bl).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    for node in ("NestedLoop", "CartesianProduct", "ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan, plan


def test_chain_is_pure_codegen(spark):
    df = spark.createDataFrame([("https://a.b.c/",)], "url string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select(domain_chain("url")).explain("formatted")
    plan = buf.getvalue()
    for node in ("Exchange", "ArrowEvalPython", "BatchEvalPython", "Join"):
        assert node not in plan, plan


def test_deep_host_and_trailing_dot_cannot_evade(spark):
    """r04 review: (a) a 12-label subdomain chain must still match its
    registrable blocked domain (the depth cap keeps the SHORT end); (b) the
    FQDN trailing-dot spelling resolves like the dotless host and must
    match; (c) a NULL id with a blocked host is NULL-unverifiable, never a
    clean FALSE."""
    deep = "https://" + ".".join(["a"] * 10) + ".example.com/x"
    docs = spark.createDataFrame(
        [(1, deep), (2, "https://example.com./page"), (None, "https://example.com/z")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("example.com",)], "domain string")
    rows = {r["doc_id"]: (r["blocked"], r["matched_domain"])
            for r in domain_blocklist_marks(docs, bl).collect()}
    assert rows[1] == (True, "example.com")
    assert rows[2] == (True, "example.com")
    assert rows[None] == (None, None)

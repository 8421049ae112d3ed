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
        for r in con.execute(r"""
WITH hosts AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(url, '^https?://') THEN
           regexp_replace(lower(regexp_replace(regexp_replace(url, '^https?://', ''), '[:/].*$', '')), '\.+$', '')
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
        [(1, deep), (2, "https://example.com./page"),
         (3, "https://example.com../page"),  # multi-dot evasion variant
         (None, "https://example.com/z")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("example.com",)], "domain string")
    rows = {r["doc_id"]: (r["blocked"], r["matched_domain"])
            for r in domain_blocklist_marks(docs, bl).collect()}
    assert rows[1] == (True, "example.com")
    assert rows[2] == (True, "example.com")
    # the multi-dot spelling doesn't even parse as a host (try_parse_url
    # rejects it) → NULL-unverifiable, which fail-closed callers DROP —
    # never a silent clean FALSE; the \.+$ normalization covers any parser
    # that does accept it
    assert rows[3] == (None, None)
    assert rows[None] == (None, None)


def test_path_blocklist_robots_semantics(spark):
    from wikidataquality_spark.operators.urlfilter import path_blocklist_marks

    docs = spark.createDataFrame(
        [
            (1, "https://a.example/private/x"),   # mid-segment prefix hit
            (2, "https://a.example/public/x"),    # unlisted path
            (3, "https://sub.a.example/private/x"),  # robots is per-host: clean
            (4, "https://b.example/anything"),    # Disallow: / blocks all
            (5, "https://b.example"),             # bare authority = root path
            (6, "not a url"),                     # unverifiable
            (7, None),                            # NULL url
            (8, "https://a.example/private/deeper/y"),  # longest prefix wins
            (None, "https://b.example/x"),        # NULL id -> unverifiable
            (9, "https://b.example./evade"),      # FQDN trailing dot stripped
            (10, "https://c.example/anything"),   # empty-prefix rule dropped
            (11, "https://a.example/private?q=1"),  # prefix applies to PATH only
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [
            ("a.example", "/priv"),
            ("a.example", "/private/deeper"),
            ("b.example", "/"),
            ("B.EXAMPLE", "/"),  # host casing normalized, dup rule harmless
            ("c.example", ""),  # bare 'Disallow:' = allow-all, must be DROPPED
        ],
        "host string, path_prefix string",
    )
    out = {r["doc_id"]: r for r in path_blocklist_marks(docs, rules).collect()}
    assert out[1]["path_blocked"] is True and out[1]["matched_prefix"] == "/priv"
    assert out[2]["path_blocked"] is False and out[2]["matched_prefix"] is None
    assert out[3]["path_blocked"] is False  # exact host, never suffix
    assert out[4]["path_blocked"] is True and out[4]["matched_prefix"] == "/"
    assert out[5]["path_blocked"] is True  # root path
    assert out[6]["path_blocked"] is None and out[7]["path_blocked"] is None
    assert out[8]["matched_prefix"] == "/private/deeper"  # most specific
    assert out[None]["path_blocked"] is None  # NULL id unverifiable
    assert out[9]["path_blocked"] is True  # 'b.example.' cannot evade
    assert out[10]["path_blocked"] is False  # allow-all rule did NOT block
    assert out[11]["path_blocked"] is True  # '/private?q=1' path is '/private'


def test_path_blocklist_duckdb_twin_and_plan(spark):
    import duckdb

    from wikidataquality_spark.operators.urlfilter import path_blocklist_marks

    rows = [
        (i, f"https://h{i % 5}.example/p{i % 7}/x{i}") for i in range(200)
    ] + [
        (900, "https://h1.example"),
        (901, "https://h1.example/p1?q=2"),    # query excluded from PATH
        (902, "https://h1.example./p1/x"),     # trailing-dot host
        (903, "https://h3.example:8443/p3/x10/y"),  # port stripped from HOST
        (904, "https://h4.example/p4/z"),       # blocked by the dotted rule
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    rules = spark.createDataFrame(
        [("h1.example", "/p1"), ("h1.example", "/"), ("h3.example", "/p3/x10"),
         ("h4.example.", "/p4")],  # dotted RULE host normalizes too
        "host string, path_prefix string",
    )
    marks = path_blocklist_marks(docs, rules)
    got = {(r["doc_id"]): (r["matched_prefix"], r["path_blocked"]) for r in marks.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{u}')" for i, u in rows)
                + ") t(doc_id, url)")
    con.execute("CREATE TABLE rules AS SELECT * FROM (VALUES "
                "('h1.example', '/p1'), ('h1.example', '/'), "
                "('h3.example', '/p3/x10'), ('h4.example.', '/p4')"
                ") t(host, path_prefix)")
    duck = con.execute(r"""
        WITH d AS (
          -- mirror parse_url semantics: HOST excludes the port and strips
          -- FQDN trailing dots (normalized like the operator); PATH
          -- excludes query string and fragment
          SELECT doc_id,
                 regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)), '\.+$', '') AS h,
                 COALESCE(NULLIF(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1), ''), '/') AS p
          FROM docs
        ),
        hits AS (
          SELECT doc_id, max_by(path_prefix, length(path_prefix)) AS mp
          FROM d JOIN rules ON d.h = regexp_replace(lower(rules.host), '\.+$', '')
          WHERE starts_with(d.p, rules.path_prefix)
          GROUP BY doc_id
        )
        SELECT d.doc_id, hits.mp, hits.mp IS NOT NULL AS blocked
        FROM d LEFT JOIN hits USING (doc_id)
    """).fetchall()
    for doc_id, mp, blocked in duck:
        assert got[doc_id] == (mp, blocked), (doc_id, got[doc_id], (mp, blocked))

    plan = marks._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

"""PII / toxicity regex scrub stage (SURVEY.md §2B "Scrub").

Parity: FormatChecker's regex machinery (ref≈includes/ConstraintCheck/Checker/
FormatChecker.php:~30-110) recast from check to rewrite: instead of reporting
a violation for a matching string, the matching span is replaced.

Implementation: a chain of F.regexp_replace Column expressions — JVM-side,
whole-stage-codegen'd, zero Python. The pattern list is ordered and versioned;
byte-identical output per url is a hard invariant (BASELINE.json:15), so
patterns are applied in a fixed sequence (later patterns see earlier
replacements). Scrubbing is idempotent: replacement tokens never re-match any
pattern (tested property, tests/test_scrub.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCRUB_VERSION = "2"  # v2: phone prefix optional (r04 review)

# (name, java_regex, replacement) — ORDER MATTERS and is frozen.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # country/area prefix OPTIONAL (v2): the v1 pattern required 1-2 digits
    # before the first separator, so the most common national formats
    # '555-123-4567' and '(555) 123-4567' were never scrubbed (r04 review)
    ("phone", r"(?:\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)

TOXICITY_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # non-capturing: match-identical for replace, and pandas str.contains
    # (the enrich flag path compiles this same constant) warns on groups
    ("blockwords", r"\b(?:badword|toxicword|slurword)\b", "<REDACTED>"),
)

ALL_PATTERNS = PII_PATTERNS + TOXICITY_PATTERNS


def scrub_column(
    text: str | Column = "text",
    patterns: tuple[tuple[str, str, str], ...] = ALL_PATTERNS,
) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    for _, pattern, repl in patterns:
        col = F.regexp_replace(col, pattern, repl)
    return col


def with_scrubbed(df, text_col: str = "text", out_col: str = "scrubbed_text"):
    return df.withColumn(out_col, scrub_column(text_col))


def pii_hit_count(text: str | Column = "text") -> Column:
    """How many PII spans a document contains (metrics/violation scoring).

    Counts SEQUENTIALLY on the progressively-scrubbed text, mirroring
    scrub_column's sequential replace: a span matching two patterns (an
    IPv4 inside an email's domain, a phone inside an email) is scrubbed
    once and must count once — independent per-pattern counts on the raw
    text double-counted it."""
    col = F.col(text) if isinstance(text, str) else text
    total = F.lit(0)
    for _, pattern, repl in PII_PATTERNS:
        total = total + (F.size(F.split(col, pattern, -1)) - 1)
        col = F.regexp_replace(col, pattern, repl)
    # NULL text (extraction failure) counts 0 hits: F.size(NULL) is NULL
    # under Spark 4 (and -1 under legacy sizeOfNull), so without the guard
    # a metrics aggregation over extraction-failure rows silently skips or
    # corrupts them (r04 review)
    orig = F.col(text) if isinstance(text, str) else text
    return F.when(orig.isNotNull(), total).otherwise(F.lit(0))

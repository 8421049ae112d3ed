"""Property-based invariants (SURVEY.md §5): scrub idempotency, dedup
determinism under repartitioning, salt-invariance of results."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from wikidataquality_spark.datagen import fixture_pages_path
from wikidataquality_spark.operators.dedup import exact_dedup, minhash_dedup
from wikidataquality_spark.operators.scrub import ALL_PATTERNS

# Pure-Python mirror of the scrub chain (same patterns, same order) — lets
# hypothesis run thousands of cases without a Spark job per example.
_PY_PATTERNS = [(re.compile(p), r) for _, p, r in ALL_PATTERNS]


def _py_scrub(text: str) -> str:
    for pat, repl in _PY_PATTERNS:
        text = pat.sub(repl, text)
    return text


@given(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=300,
    )
)
@settings(max_examples=500, deadline=None)
def test_scrub_idempotent(text):
    once = _py_scrub(text)
    assert _py_scrub(once) == once


@given(
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9._%+-]{0,20}", fullmatch=True),
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9-]{0,10}(\.[A-Za-z]{2,6}){1,2}", fullmatch=True),
)
@settings(max_examples=200, deadline=None)
def test_scrub_removes_emails(local, domain):
    # pragmatic address shapes (the scrubber is a C4-style PII pattern, not an
    # RFC 5321 parser — quoted local parts are out of scope by design)
    assert "@" not in _py_scrub(f"contact {local}@{domain} now")


def test_scrub_column_matches_python_mirror(spark):
    """The JVM regexp_replace chain and the Python mirror agree byte-for-byte
    on the fixture corpus (so the hypothesis results transfer to the real op)."""
    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.scrub import scrub_column

    path = fixture_pages_path(800, 42)
    df = spark.read.parquet(path).select("url", "text").limit(300)
    got = df.withColumn("s", scrub_column("text")).toPandas()
    assert (got["s"] == got["text"].map(_py_scrub)).all()


def test_dedup_invariant_under_repartition(spark):
    """Survivor sets must not depend on physical partitioning (deterministic
    min-url total order, SURVEY.md §7 hard-#3)."""
    path = fixture_pages_path(800, 42)
    df = spark.read.parquet(path).select("url", "text")

    a = {r["url"] for r in exact_dedup(df).select("url").collect()}
    b = {r["url"] for r in exact_dedup(df.repartition(13)).select("url").collect()}
    assert a == b

    na = {r["url"] for r in minhash_dedup(df).select("url").collect()}
    nb = {r["url"] for r in minhash_dedup(df.repartition(7)).select("url").collect()}
    assert na == nb
    assert len(na) < df.count()  # it actually dropped near-dups


def test_minhash_catches_planted_near_dups(spark):
    from pyspark.sql import functions as F

    path = fixture_pages_path(800, 42)
    df = spark.read.parquet(path).select("url", "text")
    survivors = minhash_dedup(df)
    # exact duplicates are a subset of near-duplicates: every surviving text
    # must be unique
    n_unique = survivors.select("text").distinct().count()
    assert n_unique == survivors.count()

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


@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_sql_str_roundtrip_property(s):
    """sql_str must round-trip ARBITRARY strings through Spark's escaped
    string-literal parser — rule params come from untrusted CSV config, so
    any byte sequence that parses differently (or breaks the parser) is an
    injection/corruption vector. Checked against the parser itself via a
    shared module-scoped session."""
    from wikidataquality_spark.rules.model import sql_str

    spark = _shared_spark()
    got = spark.sql(f"SELECT {sql_str(s)} AS v").first()["v"]
    assert got == s


@given(st.text(alphabet="ab` \\'x-;$", min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_sql_ident_roundtrip_property(name):
    """sql_ident must address a column of ANY hostile name (backticks,
    quotes, backslashes, spaces, SQL punctuation). Dots are F.col
    nested-field syntax by contract and have their own dedicated test
    (test_rules.test_sql_identifier_dotted_param_resolves_nested_field)."""
    from pyspark.sql import functions as SF

    from wikidataquality_spark.rules.model import sql_ident

    spark = _shared_spark()
    df = spark.range(1).select(SF.lit(7).alias(name))
    got = df.selectExpr(f"{sql_ident(name)} AS v").first()["v"]
    assert got == 7


_SPARK_CACHE = []


def _shared_spark():
    if not _SPARK_CACHE:
        from wikidataquality_spark.session import get_spark

        _SPARK_CACHE.append(get_spark(cpus=2))
    return _SPARK_CACHE[0]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=120,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=4, deadline=None)
def test_boilerplate_identity_on_arbitrary_text(spark, texts):
    """With no line over the frequency bar, remove_boilerplate_lines must be
    a BYTE-IDENTITY on arbitrary unicode (control chars, \\r, pipes, CJK) —
    split('\\n')+array_join('\\n') round-trips everything."""
    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.boilerplate import remove_boilerplate_lines

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = remove_boilerplate_lines(df, min_doc_freq=10**9)
    diff = (
        df.join(out, "doc_id")
        .filter(~F.col("text").eqNullSafe(F.col("text_cleaned")))
        .count()
    )
    assert diff == 0


@given(
    st.lists(
        st.one_of(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
                max_size=80,
            ),
            st.from_regex(
                r"https?://[A-Za-z0-9.:@-]{1,25}(/[A-Za-z0-9._~%/-]{0,20})?"
                r"(\?[A-Za-z0-9=&_,-]{0,25})?(#[A-Za-z0-9?=-]{0,10})?",
                fullmatch=True,
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=4, deadline=None)
def test_canonical_url_idempotent_on_arbitrary_strings(spark, urls):
    """canonical(canonical(u)) == canonical(u) for EVERY input — url-shaped
    or garbage (garbage passes through trimmed, which is a fixpoint)."""
    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.dedup import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url("url").alias("c"))
    diff = (
        once.select(
            "c", canonical_url(F.col("c")).alias("c2")
        )
        .filter(~F.col("c").eqNullSafe(F.col("c2")))
        .count()
    )
    assert diff == 0


def test_decontaminate_self_overlap_flags_every_eligible_doc(spark):
    """Against a benchmark equal to the corpus itself, every doc with ≥ n
    normalized words MUST flag contaminated — any normalization asymmetry
    between the doc path and the benchmark path would break this."""
    from pyspark.sql import functions as F

    from wikidataquality_spark.datagen import fixture_pages_path
    from wikidataquality_spark.operators.decontaminate import (
        contamination_marks,
        normalized_text,
    )
    from wikidataquality_spark.operators.heuristics import words_col

    n = 8
    docs = (
        spark.read.parquet(fixture_pages_path(200, 42))
        .select(F.col("url").alias("doc_id"), "text")
        .limit(120)
    )
    out = contamination_marks(docs, docs, n=n, id_col="doc_id", bench_text_col="text")
    eligible = docs.select(
        "doc_id",
        (F.size(words_col(normalized_text(F.col("text")))) >= n).alias("e"),
    )
    missed = (
        out.join(eligible, "doc_id")
        .filter(F.col("e") & ~F.col("contaminated"))
        .count()
    )
    assert missed == 0
    # and ineligible (short/NULL) docs are clean, not flagged
    false_pos = (
        out.join(eligible, "doc_id")
        .filter(~F.coalesce(F.col("e"), F.lit(False)) & F.col("contaminated"))
        .count()
    )
    assert false_pos == 0

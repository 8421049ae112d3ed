"""Text-analysis operators: fingerprints, n-grams, quality scores."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.textstats import (
    FP_PRIME,
    bpe_ish_token_count,
    ngram_jaccard,
    quality_score,
    rolling_fingerprint,
    word_ngrams,
)


def test_fingerprint_matches_python_reference(spark):
    def py_fp(text: str) -> int:
        acc = 0
        for w in text.strip().split():
            wp = 0
            for ch in w:
                wp = (wp * 131 + ord(ch)) % FP_PRIME
            acc = (acc * 31 + wp) % FP_PRIME
        return acc

    rows = [("the cat sat",), ("the  cat   sat",), ("different doc",)]
    df = spark.createDataFrame(rows, "text string")
    got = [r[0] for r in df.select(rolling_fingerprint(F.col("text"))).collect()]
    assert got[0] == py_fp("the cat sat")
    assert got[0] == got[1], "whitespace-normalization-invariant"
    assert got[2] != got[0]


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    grams = df.select(word_ngrams(F.col("text"), 3).alias("g")).collect()[0]["g"]
    assert grams == ["a b c", "b c d"]


def test_ngram_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame([("x", "a b c d", "a b c d"), ("y", "a b c d", "p q r s")],
                               "k string, t1 string, t2 string")
    out = df.select(
        "k",
        ngram_jaccard(word_ngrams(F.col("t1"), 2), word_ngrams(F.col("t2"), 2)).alias("j"),
    ).collect()
    by_k = {r["k"]: r["j"] for r in out}
    assert by_k["x"] == pytest.approx(1.0)
    assert by_k["y"] == 0.0


def test_bpe_ish_count(spark):
    df = spark.createDataFrame([("ab12,cd ef",)], "text string")
    n = df.select(bpe_ish_token_count(F.col("text")).alias("n")).collect()[0]["n"]
    assert n == 5  # ab | 12 | , | cd | ef


def test_quality_score_ranks_clean_above_junk(spark):
    rows = [
        ("clean", "the cat sat on a mat and the dog ran to the park in town"),
        ("junk", "zzzz zzzz zzzz !!!! @@@@ #### zzzz zzzz"),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    out = {r["k"]: r["q"] for r in df.select("k", quality_score(F.col("text")).alias("q")).collect()}
    assert out["clean"] > out["junk"]


def test_tokenizer_parity_spark_vs_duckdb_on_exotic_whitespace(spark):
    """The oracle CTEs split with the explicit class [\\t\\n\\x0B\\f\\r ]+
    because Java's \\s includes vertical tab while DuckDB's RE2 \\s does NOT
    — a VT in scraped text silently shifted every token-derived stat between
    the engines (r03 review finding). Pin the token counts equal on every
    ASCII whitespace the two regex dialects disagree or agree on."""
    import duckdb

    texts = [
        "a\x0bb c",      # vertical tab — the dialect gap
        "x\fy z",        # form feed
        "tab\tsep words",
        "nl\none two",
        "cr\rend here",
        "  padded  out  ",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_counts = [
        r["n"]
        for r in df.select(
            F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    duck_counts = [
        con.execute(
            "SELECT len(string_split_regex(trim(?), '[\\t\\n\\x0B\\f\\r ]+'))",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert spark_counts == duck_counts
    # and the old '\\s+' oracle regex really does diverge on VT — the guard
    # is load-bearing, not decorative
    old = con.execute(
        "SELECT len(string_split_regex(trim(?), '\\s+'))", ["a\x0bb c"]
    ).fetchone()[0]
    assert old != spark_counts[0]


def test_top_ngram_char_fraction(spark, sf0001_dir):
    """Gopher's modal-n-gram character fraction: hand-computed fixtures plus
    bit-parity with the DuckDB twin on real corpus text."""
    import duckdb
    import pandas as pd

    from wikidataquality_spark.operators.textstats import (
        top_ngram_char_fraction,
        top_ngram_char_fraction_sql,
    )

    rows = [
        (1, "buy pills buy pills buy pills"),  # "buy pills" x3 (9 ch) = 27/29
        (2, "all words are different here"),
        (3, "one"),       # fewer than 2 words -> NULL
        (4, None),        # NULL text -> NULL
        (5, ""),          # empty -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["top_ngram_char_fraction"]
        for r in top_ngram_char_fraction(df, n=2).collect()
    }
    assert got[1] == pytest.approx(27 / 29)
    # 4 distinct bigrams, modal count 1; the longest is "different here" (14 ch)
    assert got[2] == pytest.approx(14 / 28)
    assert got[3] is None and got[4] is None and got[5] is None

    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet").select("doc_id", "text")
    both = docs.unionByName(df.withColumn("doc_id", F.col("doc_id") + F.lit(10**6)))
    for n in (2, 3):
        got_df = (
            top_ngram_char_fraction(both, n=n)
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("documents", both.toPandas())
        want_df = (
            con.execute(top_ngram_char_fraction_sql(n=n))
            .df()
            .sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got_df, want_df, check_dtype=False)


def test_mapinarrow_matches_codegen(spark, sf0001_dir):
    """mapInArrow surface (zero-copy RecordBatch hook, no pandas conversion)
    — kept as the API's living example after the `mapinarrow_char_count`
    driver slot retired in favor of pack_sequences: utf8 char counts from
    pyarrow.compute must equal the codegen F.length on every doc."""
    from collections.abc import Iterator

    import pyarrow as pa
    import pyarrow.compute as pc

    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet").select("doc_id", "text")

    def char_count(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pc.cast(pc.utf8_length(batch.column(1)), pa.int64())],
                names=["doc_id", "n_chars"],
            )

    got = {
        r["doc_id"]: r["n_chars"]
        for r in docs.mapInArrow(char_count, "doc_id long, n_chars long").collect()
    }
    want = {
        r["doc_id"]: r["n_chars"]
        for r in docs.select("doc_id", F.length("text").alias("n_chars")).collect()
    }
    assert got == want


def test_compression_ratio_orders_junk_below_prose(spark):
    from wikidataquality_spark.operators.textstats import compression_ratio

    rows = [
        ("buy cheap pills now " * 200,),  # repetitive junk
        ("The committee convened at noon to review the harbor proposal, "
         "weighing dredging costs against the fishing fleet's access and "
         "the ferry schedule through the autumn months. " * 4,),
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r["r"] for r in df.select(compression_ratio(F.col("text")).alias("r")).collect()]
    assert got[0] is not None and got[1] is not None
    assert got[0] < got[1] < 1.0  # junk compresses far better than prose
    assert got[0] < 0.1
    assert got[2] is None and got[3] is None

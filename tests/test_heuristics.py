"""Heuristic stat correctness on hand-computable fixtures."""

from __future__ import annotations

import pytest

from wikidataquality_spark.operators.heuristics import with_doc_stats


@pytest.fixture(scope="module")
def stats(spark):
    rows = [
        (1, "the cat sat on a mat"),
        (2, "aa aa aa aa"),
        (3, "x!! y?? z##"),
        (4, ""),
        (5, "  padded   tokens  here  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_doc_stats(df).collect()
    return {r["doc_id"]: r for r in out}


def test_word_counts(stats):
    assert stats[1]["n_words_stat"] == 6
    assert stats[5]["n_words_stat"] == 3  # trim + \s+ split kills padding


def test_mean_word_len(stats):
    # the,cat,sat,on,a,mat → 3+3+3+2+1+3 = 15 / 6
    assert stats[1]["mean_word_len_stat"] == pytest.approx(15 / 6)


def test_stopword_ratio(stats):
    # 'the' and 'a' are stopwords → 2/6
    assert stats[1]["stopword_ratio_stat"] == pytest.approx(2 / 6)
    assert stats[2]["stopword_ratio_stat"] == 0.0


def test_symbol_ratio(stats):
    # "x!! y?? z##": 6 symbols of 11 chars
    assert stats[3]["symbol_ratio_stat"] == pytest.approx(6 / 11)
    assert stats[1]["symbol_ratio_stat"] == 0.0


def test_distinct_word_ratio(stats):
    assert stats[2]["distinct_word_ratio_stat"] == pytest.approx(1 / 4)
    assert stats[1]["distinct_word_ratio_stat"] == 1.0


def test_alpha_ratio(stats):
    assert stats[1]["alpha_ratio_stat"] == pytest.approx(15 / 20)


def test_empty_doc_null_stats(stats):
    # empty text → trim→'' → split gives [''] (1 empty token, len 0)
    assert stats[4]["mean_word_len_stat"] == 0.0 or stats[4]["mean_word_len_stat"] is None


def test_host_of_null_on_malformed_url(spark):
    """Under Spark 4's default ANSI mode, plain parse_url THROWS on a
    malformed URL — one bad crawl URL would abort a whole metrics job.
    host_of must yield NULL instead (r03 model-layer review)."""
    from wikidataquality_spark.operators.dedup import host_of

    df = spark.createDataFrame(
        [("https://ok.example.org/x",), ("ht!tp://%%%",), (None,)],
        "url string",
    )
    rows = df.select(host_of("url").alias("h")).collect()
    assert rows[0]["h"] == "ok.example.org"
    assert rows[1]["h"] is None and rows[2]["h"] is None


def test_url_wellformed_rule_survives_malformed_url(spark):
    """The well-formedness RULE must mark a violation, not die on ANSI
    INVALID_URL."""
    from wikidataquality_spark.rules.builder import apply_rules
    from wikidataquality_spark.rules.model import Rule

    df = spark.createDataFrame([("ht!tp://%%%",)], "url string")
    out = apply_rules(df, [Rule("u.wf", "url_wellformed", {"column": "url"})])
    assert out.first()["violations"][0]["status"] == "violation"


def test_pii_hit_count_no_double_count_on_overlapping_patterns(spark):
    """A span matching two PII patterns (phone-shaped email localpart,
    IP-shaped email domain) is scrubbed once and must count once: the old
    independent per-pattern counts on the raw text counted it twice."""
    from wikidataquality_spark.operators.scrub import pii_hit_count, scrub_column

    df = spark.createDataFrame(
        [
            ("mail me at +1-555-123-4567@mail.com now",),   # email ⊃ phone shape
            ("server a@1.2.3.4.com is fine",),              # email ⊃ ip shape
            ("call +1-555-123-4567 or 1.2.3.4",),           # genuinely two
        ],
        "text string",
    )
    rows = df.select(
        pii_hit_count("text").alias("n"), scrub_column("text").alias("s")
    ).collect()
    assert [r["n"] for r in rows] == [1, 1, 2]
    assert rows[0]["s"].count("<EMAIL>") == 1 and "<PHONE>" not in rows[0]["s"]


def test_rule_metrics_long_shape(spark):
    from wikidataquality_spark.metrics import rule_metrics_long
    from wikidataquality_spark.rules.builder import apply_rules
    from wikidataquality_spark.rules.model import Rule

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("u1", "2025-01-01 00:00:00", "en"), ("u2", "2025-01-01 00:00:00", None)],
        "url string, warc_ts string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    validated = apply_rules(
        df, [Rule("one_of.lang", "one_of", {"column": "lang", "allowed": "en"})]
    )
    rows = {
        (r["partition"], r["rule_id"], r["status"]): r["n"]
        for r in rule_metrics_long(validated).collect()
    }
    assert rows == {
        ("2025-01-01", "one_of.lang", "compliance"): 1,
        ("2025-01-01", "one_of.lang", "exception"): 1,
    }


def test_langid_nan_and_null_conf():
    """predict() must survive float-NaN missing strings (pandas object
    columns deliver them) and emit NULL conf for NULL text, matching the
    fused stage's exception semantics."""
    import numpy as np
    import pandas as pd

    from wikidataquality_spark.operators.langid import _load_model
    from wikidataquality_spark.operators.langid_ngram import (
        _load_model as _load_ngram_model,
    )

    ng = _load_ngram_model()
    out = ng.predict(pd.Series([float("nan"), "the quick brown fox and the dog"]))
    assert out["lang_pred"].iloc[0] is None

    marker = _load_model()
    m = marker.predict(pd.Series([None, "the quick brown fox and the dog"]))
    assert np.isnan(m["lang_conf"].iloc[0])
    assert m["lang_conf"].iloc[1] > 0


def test_dup_line_char_ratio(spark):
    """(total line chars − distinct line chars) / total line chars: the
    character-weighted Gopher duplicate-line signal, and its DuckDB twin."""
    import duckdb

    rows = [
        (1, "unique one\nunique two"),            # no repetition -> 0.0
        (2, "footer line\nbody\nfooter line"),    # 11 of 26 chars duplicated
        (3, "aa\naa\naa"),                        # 4 of 6 chars duplicated
        (4, "\n\n"),                              # 3 empty lines, 0 chars -> NULL
        (5, None),                                # NULL text -> NULL
        (6, "solo"),                              # single line -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["dup_line_char_ratio_stat"] for r in with_doc_stats(df).collect()}
    assert got[1] == 0.0
    assert got[2] == pytest.approx(11 / 26)
    assert got[3] == pytest.approx(4 / 6)
    assert got[4] is None
    assert got[5] is None
    assert got[6] == 0.0

    con = duckdb.connect()
    con.register("docs", df.toPandas())
    want = {
        r[0]: r[1]
        for r in con.execute(
            """
            SELECT doc_id,
              (list_aggregate(list_transform(string_split(text, chr(10)), x -> length(x)), 'sum')
               - list_aggregate(list_transform(list_distinct(string_split(text, chr(10))), x -> length(x)), 'sum'))
              / CAST(nullif(list_aggregate(list_transform(string_split(text, chr(10)), x -> length(x)), 'sum'), 0) AS DOUBLE)
            FROM docs
            """
        ).fetchall()
    }
    for k in got:
        if got[k] is None:
            assert want[k] is None
        else:
            assert want[k] == pytest.approx(got[k])


def test_stopword_ratio_for_dispatches_per_language(spark):
    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.heuristics import stopword_ratio_for

    rows = [
        (1, "en", "the cat and the dog"),          # 3 stops / 5 tokens
        (2, "fr", "le chat et la souris"),         # le, et, la -> 3/5
        (3, "de", "der Hund und die Katze"),       # der, und, die -> 3/5
        (4, "es", "el perro y la casa"),           # el, y, la -> 3/5... ('y' yes, 'la' yes)
        (5, "zh", "我的书在这里"),                  # chars 我,的,在,这 -> 4/6
        (6, "xx", "the cat and the dog"),          # unknown lang -> NULL
        (7, None, "the cat"),                      # NULL lang -> NULL
        (8, "en", ""),  # empty text: one empty token (house tokenizer) -> 0.0
    ]
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    out = {
        r["id"]: r["r"]
        for r in df.select(
            "id",
            F.round(
                stopword_ratio_for(F.col("text"), F.col("lang")), 4
            ).alias("r"),
        ).collect()
    }
    assert out[1] == 0.6
    assert out[2] == 0.6
    assert out[3] == 0.6
    assert out[4] == 0.6
    assert out[5] == round(4 / 6, 4)
    assert out[6] is None and out[7] is None
    assert out[8] == 0.0

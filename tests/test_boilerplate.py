"""Corpus-wide boilerplate line removal: byte-identity when nothing matches,
planted-template removal, edge docs (NULL / empty / all-boilerplate), and
bit-for-bit parity with the DuckDB twin on a real corpus slice."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.boilerplate import (
    boilerplate_line_keys,
    remove_boilerplate_lines,
    remove_boilerplate_lines_sql,
)

FOOTER = "Copyright Example Corp - all rights reserved"
NAV = "    Privacy | Terms | Contact us today    "  # trim-keyed variant


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, f"unique body zero\n{FOOTER}\nmore unique text"),
        (1, f"{NAV.strip()}\nunique body one"),
        (2, f"unique body two\n{FOOTER}"),
        (3, f"{FOOTER}\n{NAV}\nunique body three"),
        (4, NAV),  # all-boilerplate doc -> ''
        (5, "short\nok\nhi"),  # every line under min_chars -> untouched
        (6, ""),  # empty text -> one blank line, kept
        (7, None),  # NULL text survives as NULL
        (8, f"{FOOTER}\n\n{FOOTER}"),  # repeated boilerplate + blank line
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_frequent_keys_are_distinct_doc_counted(spark, corpus):
    # FOOTER in docs {0,2,3,8} (doc 8 twice - counts ONCE); NAV in {1,3,4}
    keys = boilerplate_line_keys(corpus, min_doc_freq=3, min_chars=10)
    freqs = sorted(r["doc_freq"] for r in keys.collect())
    assert freqs == [3, 4]
    # raising the bar to 5 distinct docs -> nothing qualifies
    assert boilerplate_line_keys(corpus, min_doc_freq=5, min_chars=10).count() == 0


def test_removal_preserves_non_matching_bytes(spark, corpus):
    out = {
        r["doc_id"]: (r["text_cleaned"], r["n_lines_removed"], r["n_lines_total"])
        for r in remove_boilerplate_lines(corpus, min_doc_freq=3, min_chars=10).collect()
    }
    assert out[0] == ("unique body zero\nmore unique text", 1, 3)
    # trim-keyed: doc 1's stripped NAV matches doc 3/4's padded variant
    assert out[1] == ("unique body one", 1, 2)
    assert out[2] == ("unique body two", 1, 2)
    assert out[3] == ("unique body three", 2, 3)
    assert out[4] == ("", 1, 1)  # all-boilerplate: row survives, text ''
    assert out[5] == ("short\nok\nhi", 0, 3)  # under min_chars: untouched
    assert out[6] == ("", 0, 1)  # empty text: one blank line, kept
    assert out[7] == (None, 0, 0)  # NULL text stays NULL
    assert out[8] == ("", 2, 3)  # blank separator line kept... then joined
    # doc 8: both FOOTER lines removed, the blank line survives alone
    assert out[8][0] == ""


def test_identity_when_no_line_is_frequent(spark, sf0001_dir):
    """split+rejoin must be a byte-exact identity on real corpus text when
    no line crosses the frequency bar (the north rule's byte-identical
    ethos applied to the scrub path)."""
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    out = remove_boilerplate_lines(docs, min_doc_freq=10**9)
    joined = docs.join(out, "doc_id")
    diff = joined.filter(
        ~(
            (F.col("text").isNull() & F.col("text_cleaned").isNull())
            | (F.col("text") == F.col("text_cleaned"))
        )
    )
    assert diff.count() == 0
    assert out.agg(F.sum("n_lines_removed")).first()[0] == 0


def test_duckdb_twin_parity(spark, sf0001_dir, corpus):
    """Same output as the SQL twin on real corpus text + the planted rows
    (planted doc_ids offset past the corpus range)."""
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    planted = corpus.withColumn("doc_id", F.col("doc_id") + F.lit(10**6))
    both = docs.unionByName(planted)

    got = (
        remove_boilerplate_lines(both, min_doc_freq=3, min_chars=10)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )

    con = duckdb.connect()
    con.register("documents", both.toPandas())
    want = (
        con.execute(remove_boilerplate_lines_sql(min_doc_freq=3, min_chars=10))
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_lines_removed": "int64", "n_lines_total": "int64"}),
        want.astype({"n_lines_removed": "int64", "n_lines_total": "int64"}),
        check_dtype=False,
    )
    # the planted footer must actually have been removed in this run
    planted_footer = got[got["doc_id"] == 10**6].iloc[0]
    assert FOOTER not in planted_footer["text_cleaned"]


def test_plan_has_no_cartesian_or_python(spark, corpus):
    plan = (
        remove_boilerplate_lines(corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_id_doc_passes_through_byte_identical(spark, corpus):
    """NULL-id docs cannot be grouped per-doc (NULL join key matches
    nothing; several would merge into one line group) — they must pass
    through UNCHANGED, never have their text nulled out (r04 review), and
    their lines carry no weight in the frequency count."""
    import pandas as pd

    null_rows = spark.createDataFrame(
        [(None, f"keep me intact\n{FOOTER}"), (None, None)],
        "doc_id long, text string",
    )
    both = corpus.unionByName(null_rows)
    out = remove_boilerplate_lines(both, min_doc_freq=3, min_chars=10)
    null_out = out.filter("doc_id IS NULL").collect()
    texts = {r["text_cleaned"] for r in null_out}
    # byte-identical even though one line IS corpus boilerplate
    assert texts == {f"keep me intact\n{FOOTER}", None}
    assert all(r["n_lines_removed"] == 0 for r in null_out)
    assert sorted(r["n_lines_total"] for r in null_out) == [0, 2]

    # the twin mirrors the pass-through policy
    con = duckdb.connect()
    con.register("documents", both.toPandas())
    got = (
        out.toPandas()
        .sort_values(["doc_id", "text_cleaned"], ignore_index=True)
        .astype({"n_lines_removed": "int64", "n_lines_total": "int64"})
    )
    want = (
        con.execute(remove_boilerplate_lines_sql(min_doc_freq=3, min_chars=10))
        .df()
        .sort_values(["doc_id", "text_cleaned"], ignore_index=True)
        .astype({"n_lines_removed": "int64", "n_lines_total": "int64"})
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

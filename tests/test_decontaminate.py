"""Benchmark decontamination: planted-overlap expectations, normalization
semantics, and DuckDB-twin parity on real corpus text."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.decontaminate import (
    benchmark_gram_ids,
    contamination_marks,
    contamination_marks_sql,
)

BENCH_ROWS = [
    ("What is the capital of France Paris is correct",),
    ("The mitochondria is the powerhouse of the cell",),
]


@pytest.fixture()
def bench_df(spark):
    return spark.createDataFrame(BENCH_ROWS, "text string")


def test_contamination_marks_planted(spark, bench_df):
    rows = [
        # verbatim benchmark span inside unrelated text
        (0, "intro words here. What is the capital of France Paris is correct! outro"),
        # casing + punctuation differences must NOT hide the overlap
        (1, "THE MITOCHONDRIA... is the POWERHOUSE, of the CELL"),
        # shares only a 4-gram, below n=6 -> clean
        (2, "what is the capital city of nowhere in particular today"),
        (3, "completely unrelated clean document about gardening and soil quality"),
        (4, None),   # NULL text -> clean
        (5, "too short"),  # under n words -> clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in contamination_marks(docs, bench_df, n=6).collect()}
    assert out[0]["contaminated"] is True and out[0]["n_hit_grams"] >= 4
    assert out[1]["contaminated"] is True  # normalization closes case/punct gap
    assert out[2]["contaminated"] is False and out[2]["n_hit_grams"] == 0
    assert out[3]["contaminated"] is False
    assert out[4]["contaminated"] is False and out[4]["n_hit_grams"] == 0
    assert out[5]["contaminated"] is False
    assert len(out) == 6  # every doc present (scrub-not-drop)


def test_benchmark_grams_distinct(spark, bench_df):
    # "is the" appears in both benchmark rows; the gram-id set is distinct
    g = benchmark_gram_ids(bench_df, n=2)
    assert g.count() == g.distinct().count()


def test_duckdb_twin_parity(spark, bench_df, sf0001_dir):
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # plant one contaminated doc so the parity run exercises a hit
    planted = spark.createDataFrame(
        [(10**6, "prefix noise the mitochondria is the powerhouse of the cell suffix")],
        "doc_id long, text string",
    )
    both = docs.unionByName(planted)
    got = (
        contamination_marks(both, bench_df, n=8)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", both.toPandas())
    con.register("benchmark", pd.DataFrame({"text": [r[0] for r in BENCH_ROWS]}))
    want = (
        con.execute(contamination_marks_sql(n=8))
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert bool(got[got["doc_id"] == 10**6]["contaminated"].iloc[0]) is True


def test_plan_broadcasts_benchmark_and_stays_python_free(spark, bench_df):
    docs = spark.createDataFrame(
        [(i, f"doc {i} filler words enough to form grams here now") for i in range(20)],
        "doc_id long, text string",
    )
    plan = (
        contamination_marks(docs, bench_df, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_id_contaminated_is_null_not_false(spark, bench_df):
    """A NULL-id doc whose text overlaps the benchmark must come back
    contaminated=NULL (unverifiable), never a silent False that leaks a
    contaminated doc into training data (r04 review)."""
    rows = [
        (None, "prefix the mitochondria is the powerhouse of the cell suffix"),
        (1, "clean text about something else entirely with many words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in contamination_marks(docs, bench_df, n=6).collect()}
    assert out[None]["contaminated"] is None
    assert out[None]["n_hit_grams"] is None
    assert out[1]["contaminated"] is False

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    con.register("benchmark", pd.DataFrame({"text": [r[0] for r in BENCH_ROWS]}))
    want = con.execute(contamination_marks_sql(n=6)).df()
    null_row = want[want["doc_id"].isna()].iloc[0]
    assert pd.isna(null_row["contaminated"]) and pd.isna(null_row["n_hit_grams"])

"""Bucketed tables: co-located sort-merge joins run with zero exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.io.bucketed import colocated_join, has_shuffle, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf0001_dir):
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    flags = docs.select("doc_id", (F.length("text") > 500).alias("flag"))
    write_bucketed(docs, "t_docs_b", key="doc_id", n_buckets=8)
    write_bucketed(flags, "t_flags_b", key="doc_id", n_buckets=8)
    yield "t_docs_b", "t_flags_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_flags_b")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    joined = colocated_join(spark, left, right, key="doc_id")
    assert not has_shuffle(joined.select("doc_id", "flag"))


def test_colocated_join_is_correct(spark, bucketed_pair, sf0001_dir):
    left, right = bucketed_pair
    joined = colocated_join(spark, left, right, key="doc_id")
    n = joined.count()
    assert n == spark.read.parquet(f"{sf0001_dir}/documents.parquet").count()
    # flag values survive the bucketed round-trip
    row = joined.filter(F.col("doc_id") == 0).select("flag").first()
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    expected = docs.filter(F.col("doc_id") == 0).select(
        (F.length("text") > 500).alias("flag")
    ).first()
    assert row["flag"] == expected["flag"]


def test_unbucketed_same_join_does_shuffle(spark, sf0001_dir):
    """Control: the identical join over plain parquet needs exchanges —
    proves the bucketing metadata (not AQE luck) removes them."""
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    flags = docs.select("doc_id", (F.length("text") > 500).alias("flag"))
    joined = docs.hint("merge").join(flags, "doc_id")
    assert has_shuffle(joined.select("doc_id", "flag"))

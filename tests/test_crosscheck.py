"""Per-comparer unit tests (mirroring the reference's per-comparer PHPUnit
classes, ref≈tests/phpunit/Comparer/*Test.php): each comparer's
match / partial / mismatch / null semantics, then the assembled crosscheck
operator end-to-end with a broadcast dump and dump-meta dim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.crosscheck import (
    MATCH,
    MISMATCH,
    PARTIAL,
    compare_quantity,
    compare_set,
    compare_string,
    compare_timestamp,
    crosscheck,
    dump_meta_table,
    with_dump_meta,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("s")).first()["s"]


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("hello world", "hello world", MATCH),
        ("hello world", "hello wurld", PARTIAL),  # levenshtein 1
        ("hello", "hello world", PARTIAL),  # containment
        ("hello world", "goodbye moon", MISMATCH),
        (None, None, MATCH),
        ("hello", None, MISMATCH),
        (None, "hello", MISMATCH),
    ],
)
def test_string_comparer(spark, a, b, expected):
    col = compare_string(F.lit(a).cast("string"), F.lit(b).cast("string"))
    assert _eval(spark, col) == expected


@pytest.mark.parametrize(
    "a,b,tol,expected",
    [
        (10.0, 10.0, 0.5, MATCH),
        (10.0, 10.4, 0.5, PARTIAL),
        (10.0, 11.0, 0.5, MISMATCH),
        (None, 1.0, 0.5, MISMATCH),
        (None, None, 0.5, MATCH),
    ],
)
def test_quantity_comparer(spark, a, b, tol, expected):
    col = compare_quantity(F.lit(a).cast("double"), F.lit(b).cast("double"), abs_tol=tol)
    assert _eval(spark, col) == expected


@pytest.mark.parametrize(
    "a,b,tol_s,expected",
    [
        ("2024-01-01 00:00:00", "2024-01-01 00:00:00", 60, MATCH),
        ("2024-01-01 00:00:00", "2024-01-01 00:00:30", 60, PARTIAL),
        ("2024-01-01 00:00:00", "2024-01-02 00:00:00", 60, MISMATCH),
        (None, "2024-01-01 00:00:00", 60, MISMATCH),
    ],
)
def test_timestamp_comparer(spark, a, b, tol_s, expected):
    col = compare_timestamp(
        F.lit(a).cast("timestamp"), F.lit(b).cast("timestamp"), tol_seconds=tol_s
    )
    assert _eval(spark, col) == expected


@pytest.mark.parametrize(
    "a,b,expected",
    [
        (["en", "fr"], ["fr", "en"], MATCH),  # set equality, order-free
        (["en", "fr"], ["en"], PARTIAL),
        (["en"], ["de"], MISMATCH),
        (None, ["de"], MISMATCH),
    ],
)
def test_set_comparer(spark, a, b, expected):
    col = compare_set(
        F.lit(a).cast("array<string>"), F.lit(b).cast("array<string>")
    )
    assert _eval(spark, col) == expected


def test_crosscheck_end_to_end(spark):
    checked = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0), (3, "gamma", 30.0)],
        "id long, name string, qty double",
    )
    external = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "betta", 25.0), (3, "delta", 30.5)],
        "id long, ext_name string, ext_qty double",
    )
    out = crosscheck(
        checked,
        external,
        on="id",
        fields=[
            ("name", "ext_name", "string", {}),
            ("qty", "ext_qty", "quantity", {"abs_tol": 1.0}),
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["n_match"] == 2
    assert rows[2]["n_partial"] == 1 and rows[2]["n_mismatch"] == 1
    assert rows[3]["n_partial"] == 1 and rows[3]["n_mismatch"] == 1
    # ComparisonResult structs carry the stringified values for reporting
    c = rows[2]["comparisons"][0]
    assert (c["field"], c["status"]) == ("name", PARTIAL)
    assert c["checked_value"] == "beta" and c["external_value"] == "betta"


def test_dump_meta_broadcast_join(spark):
    meta = dump_meta_table(
        spark, [("d1", "ext-dump", "en", "CC0", "2026-01-01")]
    )
    df = spark.createDataFrame([(1, "d1"), (2, "d1")], "id long, dump_id string")
    out = with_dump_meta(df, meta)
    assert out.filter(F.col("source_name") == "ext-dump").count() == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_string_vs_value_is_mismatch(spark):
    """contains('') is always true, so an empty checked value against any
    external value previously read PARTIAL — systematically understating
    mismatches for blank/scrubbed fields (r04 review)."""
    from wikidataquality_spark.operators.crosscheck import compare_string

    rows = [("", "wikipedia-mirror"), ("wikipedia-mirror", ""), ("", ""), ("ab", "")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = [
        r["s"]
        for r in df.select(
            compare_string(F.col("a"), F.col("b")).alias("s")
        ).collect()
    ]
    # '' vs long value: mismatch both directions; '' vs '': exact match;
    # 'ab' vs '': levenshtein 2 <= 2 still partial (edit-distance rule owns it)
    assert got == ["mismatch", "mismatch", "match", "partial"]


def test_crosscheck_rejects_shared_column_names(spark):
    from wikidataquality_spark.operators.crosscheck import crosscheck

    checked = spark.createDataFrame([(1, "a", 5)], "id long, source string, n_chars long")
    external = spark.createDataFrame([(1, "a", 5)], "id long, source string, n_chars long")
    with pytest.raises(ValueError, match="shared between checked and external"):
        crosscheck(checked, external, "id", [("source", "source", "string", {})])

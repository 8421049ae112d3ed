"""Cross-snapshot diff gates: hand-built edge corpus (incl. NULL-text
semantics), DuckDB-twin parity on a generated recrawl, the changed-slice
composition with incremental dedup state, and the narrow-join plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from wikidataquality_spark.operators.snapshot import (
    changed_slice,
    snapshot_diff,
    snapshot_diff_sql,
    snapshot_diff_summary,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_statuses_including_null_text_semantics(spark):
    old = _snap(
        spark,
        [
            ("u1", "same"),
            ("u2", "old bytes"),
            ("u3", "gone"),
            ("u4", None),  # NULL → NULL: unchanged
            ("u5", None),  # NULL → text: changed
            ("u6", "text"),  # text → NULL: changed
        ],
    )
    new = _snap(
        spark,
        [
            ("u1", "same"),
            ("u2", "new bytes"),
            ("u4", None),
            ("u5", "now has text"),
            ("u6", None),
            ("u7", "brand new"),
        ],
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "unchanged",
        "u5": "changed",
        "u6": "changed",
        "u7": "added",
    }
    summary = {r["status"]: r["n"] for r in snapshot_diff_summary(snapshot_diff(old, new)).collect()}
    assert summary == {"unchanged": 2, "changed": 3, "removed": 1, "added": 1}

    sliced = sorted(r["url"] for r in changed_slice(new, snapshot_diff(old, new)).collect())
    assert sliced == ["u2", "u5", "u6", "u7"]  # exactly added+changed


def test_null_id_rows_agree_between_diff_and_slice(spark):
    """NULL ids never equi-join: the diff reports them added/removed, and
    changed_slice must carry the same added rows (a plain semi-join would
    silently drop them — the slice would disagree with the report)."""
    old = _snap(spark, [("u1", "same"), (None, "orphan-old")])
    new = _snap(spark, [("u1", "same"), (None, "orphan-new"), ("u2", "fresh")])
    diff = snapshot_diff(old, new)
    nones_first = lambda t: (t[0] is not None, t[0] or "", t[1])  # noqa: E731
    statuses = sorted(
        ((r["url"], r["status"]) for r in diff.collect()), key=nones_first
    )
    assert statuses == [
        (None, "added"),
        (None, "removed"),
        ("u1", "unchanged"),
        ("u2", "added"),
    ]
    sliced = sorted(
        ((r["url"], r["text"]) for r in changed_slice(new, diff).collect()),
        key=nones_first,
    )
    assert sliced == [(None, "orphan-new"), ("u2", "fresh")]


def test_duckdb_twin_parity_on_generated_recrawl(spark):
    from wikidataquality_spark.datagen import generate_pages

    day1 = generate_pages(120, seed=31)[["url", "text"]]
    # recrawl: drop a tail slice (removed), mutate a stripe (changed), add
    # fresh urls (added), keep the rest byte-identical
    day2 = day1.iloc[:100].copy()
    day2.loc[day2.index % 7 == 0, "text"] = day2.loc[day2.index % 7 == 0, "text"] + "\nedited"
    extra = generate_pages(20, seed=32)[["url", "text"]]
    extra["url"] = "https://new.example/p/" + extra.index.astype(str)
    day2 = pd.concat([day2, extra], ignore_index=True)

    spark_out = (
        snapshot_diff(spark.createDataFrame(day1), spark.createDataFrame(day2))
        .orderBy("url")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("snap_old", day1)
    con.register("snap_new", day2)
    duck_out = con.execute(
        snapshot_diff_sql() + " ORDER BY url"
    ).fetchdf()
    pd.testing.assert_frame_equal(
        spark_out.reset_index(drop=True), duck_out.reset_index(drop=True),
        check_dtype=False,
    )


def test_changed_slice_feeds_incremental_dedup(spark):
    """The composition the operator exists for: only the added+changed slice
    re-enters incremental validation, against state built from the old
    snapshot."""
    from wikidataquality_spark.operators.dedup import dup_fingerprints, dup_marks

    old = _snap(spark, [("u1", "alpha text here"), ("u2", "beta text here")])
    new = _snap(
        spark,
        [
            ("u1", "alpha text here"),  # unchanged — not reprocessed
            ("u2", "alpha text here"),  # changed into a dup of u1
            ("u3", "gamma text here"),  # added, novel
        ],
    )
    sl = changed_slice(new, snapshot_diff(old, new))
    state = dup_fingerprints(old)
    marked = {r["url"]: r["is_exact_dup"] for r in dup_marks(sl, state=state).collect()}
    assert marked == {"u2": True, "u3": False}


def test_plan_is_one_narrow_equi_join(spark):
    old = _snap(spark, [("u1", "a")])
    new = _snap(spark, [("u1", "a")])
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # documents' text never reaches the join: both sides project to hashes
    # at the source, so no exchange row carries the text column
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0)
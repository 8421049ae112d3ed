"""Chunking gates: window algebra by hand, overlap/coverage/reconstruction
properties, edge docs, DuckDB-twin parity, and the zero-shuffle plan."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.chunking import (
    chunk_documents,
    chunk_documents_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_algebra_by_hand(spark):
    # 10 tokens, chunk 4, overlap 1 → stride 3 → starts 0,3,6 (ceil(9/3)=3)
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=4, overlap=1
    ).collect()
    got = {(r["chunk_idx"]): (r["chunk_start"], r["chunk_len"], r["chunk_text"]) for r in out}
    assert got == {
        0: (0, 4, "t0 t1 t2 t3"),
        1: (3, 4, "t3 t4 t5 t6"),
        2: (6, 4, "t6 t7 t8 t9"),
    }
    assert all(r["n_chunks"] == 3 for r in out)


def test_edges_short_null_and_whitespace(spark):
    rows = [
        (1, "one two"),  # shorter than a window → single whole chunk
        (2, None),  # NULL → no rows
        (3, "   \n\t  "),  # whitespace-only → no rows
        (4, "  padded   tokens \n here  "),  # runs collapse, no empties
    ]
    out = chunk_documents(_docs(spark, rows), chunk_tokens=4, overlap=1).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert set(by_id) == {1, 4}
    assert by_id[1][0]["chunk_text"] == "one two" and by_id[1][0]["n_chunks"] == 1
    assert by_id[4][0]["chunk_text"] == "padded tokens here"
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, rows), chunk_tokens=4, overlap=4)


def test_overlap_coverage_reconstruction_properties(spark):
    from wikidataquality_spark.datagen import generate_pages

    pdf = generate_pages(60, seed=41)[["text"]].reset_index()
    pdf = pdf.rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf)
    chunk_tokens, overlap = 32, 8
    stride = chunk_tokens - overlap
    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    toks_by_doc = {
        int(i): [t for t in str(s).split() if t] for i, s in zip(pdf["doc_id"], pdf["text"])
    }
    per_doc: dict[int, list] = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        full = toks_by_doc[doc_id]
        # coverage + exact overlap: stitching chunks (dropping each
        # successor's leading overlap) reconstructs the token stream
        stitched = rows[0]["chunk_text"].split()
        for r in rows[1:]:
            assert r["chunk_start"] == rows[0]["chunk_start"] + r["chunk_idx"] * stride
            piece = r["chunk_text"].split()
            keep_from = len(stitched) - r["chunk_start"]
            assert piece[:keep_from] == stitched[r["chunk_start"]:]  # overlap agrees
            stitched.extend(piece[keep_from:])
        assert stitched == full
        # every chunk bounded; only the tail may be short
        for r in rows[:-1]:
            assert r["chunk_len"] == chunk_tokens
        assert 0 < rows[-1]["chunk_len"] <= chunk_tokens


def test_duckdb_twin_parity(spark):
    from wikidataquality_spark.datagen import generate_pages

    pdf = generate_pages(80, seed=42)[["text"]].reset_index()
    pdf = pdf.rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf)
    spark_out = (
        chunk_documents(docs, chunk_tokens=16, overlap=4)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    duck_out = con.execute(
        chunk_documents_sql(chunk_tokens=16, overlap=4)
        + " ORDER BY doc_id, chunk_idx"
    ).fetchdf()
    pd.testing.assert_frame_equal(
        spark_out.reset_index(drop=True),
        duck_out.reset_index(drop=True),
        check_dtype=False,
    )


def test_plan_is_pure_codegen_no_shuffle(spark):
    docs = _docs(spark, [(1, "a b c")])
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # per-row operator: zero shuffle
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
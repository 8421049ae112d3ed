"""Exact-substring duplicate spans: planted cross-doc and within-doc
repeats, span merging (overlap + adjacency + gap), edge docs, removal
semantics, DuckDB-twin parity on a real corpus slice, and the narrow-shuffle
plan gate."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.dupspans import (
    dup_span_stats,
    dup_span_stats_sql,
    dup_spans,
    remove_dup_spans,
)

K = 4  # small k so fixtures stay readable

REPEAT = "alpha beta gamma delta"  # one exact k-gram at k=4


def _doc(i: int, text: str | None):
    return (i, text)


@pytest.fixture()
def corpus(spark):
    rows = [
        # docs 0/1 share REPEAT (cross-doc duplicate)
        _doc(0, f"{REPEAT} unique zero tail words here"),
        _doc(1, f"start one {REPEAT} more unique padding"),
        # doc 2: within-doc repeat (counts toward min_occurrences)
        _doc(2, f"{REPEAT} mid filler {REPEAT}"),
        # doc 3: entirely unique
        _doc(3, "completely fresh words that nobody else uses at all"),
        # doc 4: under k tokens
        _doc(4, "tiny doc"),
        # doc 5: NULL text
        _doc(5, None),
        # doc 6: empty text
        _doc(6, ""),
        # docs 7/8: long shared run -> overlapping windows must merge to ONE span
        _doc(7, "p q r s t u v w x unique7 ending seven"),
        _doc(8, "unique8 opening p q r s t u v w x trailing"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_spans_and_merging(spark, corpus):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dup_spans(corpus, k=K).collect()
    }
    # doc 0: REPEAT at tokens [0,4); doc 1: at [2,6)
    assert (0, 0, 4) in spans
    assert (1, 2, 6) in spans
    # doc 2: two occurrences [0,4) and [6,10) - gap of 2 tokens > 0, and
    # positions 0 and 6 differ by more than k? 6-0=6 > 4 -> two islands
    assert (2, 0, 4) in spans and (2, 6, 10) in spans
    # docs 7/8: the 9-token shared run 'p q r s t u v w x' produces 6
    # overlapping k-windows that must merge into ONE maximal span
    assert (7, 0, 9) in spans
    assert (8, 2, 11) in spans
    # unique / short / NULL / empty docs produce no spans
    assert not any(d in (3, 4, 5, 6) for d, _, _ in spans)


def test_stats_fractions_and_edge_docs(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in dup_span_stats(corpus, k=K).collect()
    }
    assert out[0]["n_dup_spans"] == 1
    assert out[0]["dup_token_count"] == 4
    assert out[0]["n_tokens"] == 9
    assert out[0]["dup_token_fraction"] == pytest.approx(4 / 9)
    # within-doc repeats: doc 2 has 10 tokens, 8 duplicated
    assert out[2]["dup_token_count"] == 8
    assert out[2]["dup_token_fraction"] == pytest.approx(0.8)
    # unique doc: zeros, not NULLs
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_token_count"] == 0
    # under-k doc: zeros (no gram exists)
    assert out[4]["n_dup_spans"] == 0
    # NULL text: NULL stats (house dedup exemption)
    assert out[5]["n_tokens"] is None and out[5]["dup_token_count"] is None
    assert out[5]["dup_token_fraction"] is None
    # empty text: one empty token, zero spans, fraction 0
    assert out[6]["n_tokens"] == 1 and out[6]["dup_token_fraction"] == 0.0


def test_adjacent_windows_merge_but_gapped_do_not(spark):
    # shared run of exactly 2k tokens in two docs: windows at pos 0..k are
    # pairwise-overlapping/adjacent -> ONE span covering all 2k tokens
    run = " ".join(f"w{i}" for i in range(8))  # 2k tokens at k=4
    df = spark.createDataFrame(
        [(0, f"{run} zero unique alpha"), (1, f"one unique beta {run}")],
        "doc_id long, text string",
    )
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in dup_spans(df, k=4).collect()}
    assert (0, 0, 8) in spans and (1, 3, 11) in spans
    assert len(spans) == 2


def test_removal_drops_spans_only(spark, corpus):
    out = {r["doc_id"]: r["text_deduped"]
           for r in remove_dup_spans(corpus, k=K).collect()}
    assert out[0] == "unique zero tail words here"
    assert out[1] == "start one more unique padding"
    assert out[2] == "mid filler"
    # span-free docs: tokens rejoined (whitespace-canonical, documented)
    assert out[3] == "completely fresh words that nobody else uses at all"
    assert out[4] == "tiny doc"
    assert out[5] is None
    assert out[7] == "unique7 ending seven"


def test_duckdb_twin_parity_on_corpus_slice(spark, sf001_dir):
    """Stats parity on the real sf0.01 documents table (which contains
    planted exact/near duplicates, so dup spans actually fire): string-gram
    twin == double-hash Spark output, bit for bit."""
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    got = (
        dup_span_stats(docs, k=8)
        .select("doc_id", "n_tokens", "n_dup_spans", "dup_token_count",
                "dup_token_fraction")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001_dir}/documents.parquet')"
    )
    want = con.execute(
        dup_span_stats_sql(k=8) + " ORDER BY doc_id"
    ).df()
    # sanity: the planted duplicates must actually produce spans
    assert int(got["n_dup_spans"].sum()) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_plan_never_shuffles_document_bodies(spark, sf001_dir):
    """Every Exchange in the span plan carries only ids/positions/hashes -
    the text column must not appear in any shuffle (the dedup.py contract)."""
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = (
        dup_spans(docs, k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_hot_gram_skew_bound_on_boilerplate_corpus(spark):
    """r04 VERDICT #4: a boilerplate gram planted in 80% of docs must be
    detected by the Misra-Gries pass with a PROVEN duplicate certificate
    (count_lb >= min_occurrences), its positions must bypass the semi join
    (bounding every remaining join key's multiplicity), and the final span
    stats must equal the exact hot_gram_fraction=None path row for row."""
    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.dupspans import (
        _gram_positions,
        dup_span_stats,
        hot_gram_keys,
    )

    boiler = "cookies and terms of service apply to this site"  # 9 words > k=8
    rows = []
    for d in range(100):
        body = " ".join(f"u{d}w{j}" for j in range(12))  # unique filler
        text = f"{boiler} {body}" if d < 80 else body
        rows.append((d, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pos = _gram_positions(docs, 8, "doc_id", "text")
    hot = hot_gram_keys(pos, min_occurrences=2, hot_fraction=0.02)
    assert hot  # the planted boilerplate grams are found and certified
    # join-side bound: after removing hot keys, no remaining key's
    # multiplicity exceeds the hot threshold (+ MG undercount slack)
    n_total = pos.count()
    cold = pos.filter(~F.col("_h1").isin(hot))
    max_mult = (
        cold.groupBy("_h1", "_h2").count().agg(F.max("count")).first()[0] or 0
    )
    assert max_mult <= max(2, int(0.02 * n_total))
    assert cold.count() < n_total  # the hot positions really left the join

    bounded = dup_span_stats(docs, hot_gram_fraction=0.02).orderBy("doc_id")
    unbounded = dup_span_stats(docs, hot_gram_fraction=None).orderBy("doc_id")
    assert [tuple(r) for r in bounded.collect()] == [
        tuple(r) for r in unbounded.collect()
    ]

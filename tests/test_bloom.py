"""Bloom cross-corpus dedup: the probabilistic contract itself is the gate —
zero false negatives against an exact anti-join ground truth, FP rate within
the sized bound, determinism under repartition, NULL semantics, and the
word/bit packing verified bit-for-bit against a pure-Python filter built
from Spark's own hash values (the filter math has no engine-specific part
once the two xxhash64s are fixed)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.bloom import (
    bloom_member_marks,
    bloom_probe_positions,
    bloom_size,
    build_bloom,
    cross_corpus_dedup_marks,
)

SF001 = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF001, "documents.parquet"))


def test_bloom_size_math():
    m, k = bloom_size(1000, 0.01)
    assert m & (m - 1) == 0 and m >= 1000  # power of two, roomy
    # realized FP at the rounded-up m is never worse than requested
    realized = (1 - math.exp(-k * 1000 / m)) ** k
    assert realized <= 0.011
    with pytest.raises(ValueError):
        bloom_size(0)
    with pytest.raises(ValueError):
        bloom_size(10, 1.5)
    with pytest.raises(ValueError):
        bloom_size(10**15, 1e-9)  # > 2^46-bit cap must refuse, not wrap


def test_no_false_negatives_and_fp_bound(spark):
    docs = _docs(spark)
    # corpus = even ids, batch = everything; ground truth by exact text
    corpus = docs.filter(F.col("doc_id") % 2 == 0).filter(F.col("text").isNotNull())
    n = corpus.count()
    m, k = bloom_size(n, 0.01)
    bloom = build_bloom(corpus, F.col("text"), m, k)
    marks = bloom_member_marks(docs, bloom, F.col("text"), m, k).toPandas()

    truth = {
        r["doc_id"]: r["hit"]
        for r in docs.alias("d")
        .join(
            corpus.select(F.col("text").alias("_ct")).distinct(),
            F.col("d.text") == F.col("_ct"),
            "left",
        )
        .select("doc_id", F.col("_ct").isNotNull().alias("hit"))
        .collect()
    }
    flagged = dict(zip(marks["doc_id"], marks["in_corpus_maybe"]))
    members = [i for i, h in truth.items() if h]
    assert members, "fixture must contain true members"
    # the hard guarantee: every true member flagged
    assert all(flagged[i] for i in members)
    # FP rate over true non-members within 5x the sized bound (tiny sample)
    nonmembers = [i for i, h in truth.items() if not h]
    fp = sum(1 for i in nonmembers if flagged[i])
    assert fp / max(len(nonmembers), 1) <= 0.05


def test_packing_matches_pure_python_filter(spark):
    """Build the filter two ways from the SAME hash values: the Spark
    explode/bit_or aggregation and a pure-Python set-of-bits — (word, bits)
    rows must match exactly, and every probe of a member key must hit."""
    rows = [(i, f"doc text {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m, k = 1 << 12, 5
    pos = (
        df.select(F.explode(bloom_probe_positions(F.col("text"), m, k)).alias("p"))
        .toPandas()["p"]
        .tolist()
    )
    words: dict[int, int] = {}
    for p in pos:
        assert 0 <= p < m
        words[p >> 6] = words.get(p >> 6, 0) | (1 << (p & 63))
    # two's-complement fold to signed 64-bit (Spark longs are signed)
    expected = {
        w: b - (1 << 64) if b >= (1 << 63) else b for w, b in words.items()
    }
    got = {
        r["word"]: r["bits"]
        for r in build_bloom(df, F.col("text"), m, k).collect()
    }
    assert got == expected


def test_probe_positions_distinct_and_null(spark):
    df = spark.createDataFrame([("abc",), (None,)], "text string")
    out = df.select(
        bloom_probe_positions(F.col("text"), 1 << 20, 7).alias("p")
    ).collect()
    ps = out[0]["p"]
    # odd-step double hashing: k probes of one key never all collapse
    assert len(set(ps)) > 1 and all(0 <= p < (1 << 20) for p in ps)
    assert out[1]["p"] is None


def test_null_key_and_null_id_marks(spark):
    corpus = spark.createDataFrame([("a",), ("b",)], "text string")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "zzz"), (3, None), (None, "a")],
        "doc_id long, text string",
    )
    m, k = 1 << 10, 4
    bloom = build_bloom(corpus, F.col("text"), m, k)
    got = {
        r["doc_id"]: r["in_corpus_maybe"]
        for r in bloom_member_marks(batch, bloom, F.col("text"), m, k).collect()
    }
    assert got[1] is True  # member
    assert got[3] is None  # NULL key: membership undefined
    assert got[None] is None  # NULL id: unverifiable, audible
    assert got[2] in (False, True)  # non-member: FP allowed, never an error


def test_determinism_under_repartition(spark):
    docs = _docs(spark).filter(F.col("text").isNotNull()).limit(200)
    m, k = 1 << 16, 6
    b1 = build_bloom(docs, F.col("text"), m, k)
    b2 = build_bloom(docs.repartition(13), F.col("text"), m, k)
    assert sorted(map(tuple, b1.collect())) == sorted(map(tuple, b2.collect()))


def test_cross_corpus_convenience_reuses_filter(spark):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") < 100)
    marks, bloom = cross_corpus_dedup_marks(docs, corpus, fp_rate=0.02)
    assert marks.filter(F.col("in_corpus_maybe")).count() >= corpus.filter(
        F.col("text").isNotNull()
    ).select("text").distinct().count() > 0
    # the returned filter probes a SECOND batch without touching the corpus
    assert bloom.count() > 0


def test_probe_plan_narrow_rows_no_text_exchange(spark):
    """The probe side's exchanges must carry only (id, word, bit) longs —
    the document text collapses to hash probes before any join, and no
    nested-loop join may appear at any size."""
    import contextlib
    import io

    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    m, k = bloom_size(250, 0.01)
    bloom = build_bloom(corpus, F.col("text"), m, k)
    marks = bloom_member_marks(docs, bloom, F.col("text"), m, k)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        marks.explain("formatted")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    # every Exchange argument line must mention only probe/filter columns
    for line in plan.splitlines():
        if "Exchange" in line and "text#" in line:
            raise AssertionError(f"text rides an exchange: {line}")

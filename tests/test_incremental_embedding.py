"""Incremental embedding near-dup marks: batch-equivalence, resume, precedence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.simsearch import (
    embedding_state_fingerprints,
    lsh_neardup_marks_incremental,
    lsh_neardup_pairs,
)


@pytest.fixture(scope="module")
def corpus(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _marks_from_full_recompute(spark, union_df, batch_ids, threshold):
    """Reference: flags a batch row iff the FULL (history ∪ batch) pair
    computation pairs it with a smaller id — valid whenever every history
    id precedes every batch id (the streaming survivor-order invariant)."""
    pairs = lsh_neardup_pairs(union_df, threshold=threshold).collect()
    flagged = {r["id_b"] for r in pairs}  # id_a < id_b: the larger id loses
    return {i: (i in flagged) for i in batch_ids}


def test_incremental_equals_full_recompute(spark, corpus):
    """Split the corpus at the id median: history is processed first, then
    the batch arrives. Incremental marks (state buckets + state vectors)
    must equal the full-recompute reference for every batch row."""
    history = corpus.filter(F.col("vec_id") < 250)
    batch = corpus.filter(F.col("vec_id") >= 250)
    state = embedding_state_fingerprints(history)
    got = {
        r["vec_id"]: r["is_near_dup"]
        for r in lsh_neardup_marks_incremental(
            batch, state, history, threshold=0.4
        ).collect()
    }
    batch_ids = [r["vec_id"] for r in batch.select("vec_id").collect()]
    want = _marks_from_full_recompute(spark, corpus, batch_ids, 0.4)
    assert got == want
    assert any(got.values())  # threshold 0.4 has real positives at sf0.01


def test_first_batch_no_state(spark, corpus):
    """None/None state = pure within-batch marks (the first crawl)."""
    batch = corpus.filter(F.col("vec_id") < 250)
    got = {
        r["vec_id"]: r["is_near_dup"]
        for r in lsh_neardup_marks_incremental(
            batch, None, None, threshold=0.4
        ).collect()
    }
    batch_ids = [r["vec_id"] for r in batch.select("vec_id").collect()]
    want = _marks_from_full_recompute(spark, batch, batch_ids, 0.4)
    assert got == want


def test_retried_batch_does_not_flag_itself(spark, corpus):
    """Exactly-once resume: replaying a batch whose fingerprints were
    already appended to the state must produce the same marks as the first
    run — a row must never near-dup against its own previous write."""
    batch = corpus.filter(F.col("vec_id") < 250)
    first = {
        r["vec_id"]: r["is_near_dup"]
        for r in lsh_neardup_marks_incremental(
            batch, None, None, threshold=0.4
        ).collect()
    }
    state = embedding_state_fingerprints(batch)  # the batch's own write
    retried = {
        r["vec_id"]: r["is_near_dup"]
        for r in lsh_neardup_marks_incremental(
            batch, state, batch, threshold=0.4
        ).collect()
    }
    assert retried == first


def test_state_always_outranks_batch(spark):
    """Written-copy-wins even when the state id is LARGER than the batch
    id (partition resume: ids arbitrary relative to the batch)."""
    from pyspark.sql import Row

    rng = np.random.default_rng(3)
    v = rng.normal(size=64)
    v = (v / np.linalg.norm(v)).tolist()
    other = rng.normal(size=64)
    other = (other / np.linalg.norm(other)).tolist()
    hist = spark.createDataFrame([Row(vec_id=900, embedding=v)])
    batch = spark.createDataFrame(
        [Row(vec_id=1, embedding=v), Row(vec_id=2, embedding=other)]
    )
    got = {
        r["vec_id"]: r["is_near_dup"]
        for r in lsh_neardup_marks_incremental(
            batch, embedding_state_fingerprints(hist), hist, threshold=0.95
        ).collect()
    }
    # batch id 1 < state id 900, yet the state copy survives
    assert got == {1: True, 2: False}


def test_degenerate_batch_rows_unflagged(spark):
    """NULL/ragged/zero/NaN vectors are unpairable by contract: they appear
    in the output (count parity) but never flag."""
    from pyspark.sql import Row

    batch = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=None),
            Row(vec_id=2, embedding=[0.0] * 64),
            Row(vec_id=3, embedding=[float("nan")] + [1.0] * 63),
            Row(vec_id=4, embedding=[1.0] * 10),
        ]
    )
    got = {
        r["vec_id"]: r["is_near_dup"]
        for r in lsh_neardup_marks_incremental(
            batch, None, None, threshold=0.0
        ).collect()
    }
    assert got == {1: False, 2: False, 3: False, 4: False}

def test_one_sided_state_raises(spark):
    """Exactly one of (state_buckets, state_vectors) is a wiring bug, not a
    degraded mode: the inner verify join would silently drop every state
    candidate and return within-batch-only marks (r04 review,
    runtime-verified). The operator must refuse."""
    from pyspark.sql import Row

    rng = np.random.default_rng(5)
    v = (lambda a: (a / np.linalg.norm(a)).tolist())(rng.normal(size=64))
    hist = spark.createDataFrame([Row(vec_id=900, embedding=v)])
    batch = spark.createDataFrame([Row(vec_id=1, embedding=v)])
    with pytest.raises(ValueError, match="together"):
        lsh_neardup_marks_incremental(
            batch, embedding_state_fingerprints(hist), None, threshold=0.95
        )
    with pytest.raises(ValueError, match="together"):
        lsh_neardup_marks_incremental(batch, None, hist, threshold=0.95)

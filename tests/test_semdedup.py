"""SemDeDup: planted-duplicate semantics, survivor priority, guards, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wikidataquality_spark.operators.semdedup import (
    load_semdedup_centroids,
    semdedup_marks,
    semdedup_marks_sql,
)

DIM = 8
# two well-separated cluster directions
_C0 = [1.0] + [0.0] * (DIM - 1)
_C1 = [0.0, 1.0] + [0.0] * (DIM - 2)
CENTROIDS = [_C0, _C1]


def _vec(base: list[float], eps: float, j: int) -> list[float]:
    v = np.asarray(base, dtype=np.float64)
    v[j] += eps
    return v.tolist()


@pytest.fixture(scope="module")
def planted(spark):
    # cluster 1 (x-axis): ids 1,2 nearly identical (dup pair), id 3 rotated
    # away enough to stay below the 0.9 threshold vs both
    rows = [
        Row(vec_id=1, embedding=_vec(_C0, 0.01, 2)),
        Row(vec_id=2, embedding=_vec(_C0, 0.02, 2)),
        Row(vec_id=3, embedding=_vec(_C0, 0.9, 3)),
        # cluster 2 (y-axis): a triple of mutual near-dups
        Row(vec_id=10, embedding=_vec(_C1, 0.01, 4)),
        Row(vec_id=11, embedding=_vec(_C1, 0.02, 4)),
        Row(vec_id=12, embedding=_vec(_C1, 0.03, 4)),
        # degenerate rows every guard must drop
        Row(vec_id=90, embedding=None),
        Row(vec_id=91, embedding=[1.0] * (DIM - 1)),  # ragged
        Row(vec_id=92, embedding=[0.0] * DIM),  # zero norm
        Row(vec_id=93, embedding=[float("nan")] + [1.0] * (DIM - 1)),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def marks(planted):
    out = semdedup_marks(planted, CENTROIDS, threshold=0.9, dim=DIM)
    return {r["vec_id"]: r.asDict() for r in out.collect()}


def test_invalid_vectors_dropped(marks):
    assert set(marks) == {1, 2, 3, 10, 11, 12}


def test_cluster_assignment(marks):
    assert [marks[i]["cell"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [marks[i]["cell"] for i in (10, 11, 12)] == [2, 2, 2]


def test_lowest_centroid_sim_survives(marks):
    # within each dup neighborhood exactly one survivor: the member FARTHEST
    # from the centroid (lowest centroid_sim); larger perturbation = lower sim
    assert marks[2]["is_semdup"] is False and marks[1]["is_semdup"] is True
    assert marks[12]["is_semdup"] is False
    assert marks[11]["is_semdup"] is True and marks[10]["is_semdup"] is True
    # the rotated-away cluster member is not anyone's duplicate
    assert marks[3]["is_semdup"] is False


def test_centroid_sim_is_cosine(marks):
    v = np.asarray(_vec(_C0, 0.01, 2))
    c = np.asarray(_C0)
    expect = float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
    assert marks[1]["centroid_sim"] == pytest.approx(expect, abs=1e-4)


def test_oracle_parity_on_planted(spark, planted):
    duckdb = pytest.importorskip("duckdb")
    out = (
        semdedup_marks(planted, CENTROIDS, threshold=0.9, dim=DIM)
        .orderBy("vec_id")
        .collect()
    )
    pdf = planted.toPandas()
    con = duckdb.connect()
    con.register("embeddings", pdf)
    sql = semdedup_marks_sql(CENTROIDS, threshold=0.9, dim=DIM)
    ora = con.execute(sql + " ORDER BY a.vec_id").fetchall()
    got = [(r["vec_id"], r["cell"], r["centroid_sim"], r["is_semdup"]) for r in out]
    assert got == [tuple(r) for r in ora]


def test_artifact_loads_and_matches_trainer_params():
    import json

    from wikidataquality_spark.operators.semdedup import SEMDEDUP_CENTROIDS_V1

    with open(SEMDEDUP_CENTROIDS_V1) as f:
        art = json.load(f)
    # every geometry-changing train_centroids parameter is pinned in the
    # artifact, so a silent trainer-default drift is detectable
    assert {
        k: art[k] for k in ("version", "n_lists", "dim", "sample_n", "iters", "seed")
    } == {"version": "v1", "n_lists": 8, "dim": 64, "sample_n": 2048, "iters": 8, "seed": 13}
    cents = load_semdedup_centroids()
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # spherical k-means centroids are unit-norm (or a reseeded unit sample)
    for c in cents:
        assert np.linalg.norm(c) == pytest.approx(1.0, abs=1e-9)


def test_plan_shape(planted):
    """Assignment must not shuffle (no Exchange before the cell join) and
    candidate generation must be an equi-join: the plan may contain only
    hash-partitioned Exchanges (the cell self-join + narrow mark join) —
    no CartesianProduct, no BroadcastNestedLoopJoin, no Window."""
    out = semdedup_marks(planted, CENTROIDS, threshold=0.9, dim=DIM)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Window" not in plan


def test_sf001_has_both_mark_values(spark, sf001_dir):
    """On the real corpus with the frozen artifact the marks are non-trivial:
    some semantic dups exist at threshold 0.4 and most rows survive."""
    e = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    out = semdedup_marks(e, load_semdedup_centroids(), threshold=0.4)
    counts = {r["is_semdup"]: r["n"] for r in out.groupBy("is_semdup").agg(F.count("*").alias("n")).collect()}
    assert counts.get(True, 0) > 0
    assert counts.get(False, 0) > counts.get(True, 0)

"""Similarity search: brute-force correctness + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.simsearch import (
    brute_force_topk,
    cosine,
    lsh_ann,
)


@pytest.fixture(scope="module")
def emb(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/embeddings.parquet")


def test_cosine_self_is_one(spark, emb):
    row = emb.limit(1).select(cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert row[0]["c"] == pytest.approx(1.0)


def test_brute_force_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = mat[ids == 0][0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(c, i) for c, i in zip(cos, ids) if i != 0], key=lambda t: (-t[0], t[1])
    )
    expected = [i for _, i in order[:5]]

    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = (
        brute_force_topk(emb, queries, k=5)
        .orderBy("rank")
        .select("vec_id")
        .toPandas()["vec_id"]
        .tolist()
    )
    assert got == expected


def test_lsh_recall_above_half(spark, emb):
    """LSH with 4 tables × 8 bits should recover most of the true top-5."""
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = brute_force_topk(emb, queries, k=5).select("q_id", "vec_id").toPandas()
    approx = lsh_ann(emb, queries, k=5).select("q_id", "vec_id").toPandas()
    exact_set = set(map(tuple, exact.values.tolist()))
    approx_set = set(map(tuple, approx.values.tolist()))
    # exclude trivial self matches from lsh side
    approx_set = {(q, v) for q, v in approx_set if q != v}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall {recall}"


def test_lsh_deterministic(spark, emb):
    queries = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    a = lsh_ann(emb, queries, k=5).select("q_id", "vec_id", "rank").toPandas()
    b = lsh_ann(emb.repartition(5), queries, k=5).select("q_id", "vec_id", "rank").toPandas()
    assert a.sort_values(["q_id", "rank"]).values.tolist() == b.sort_values(["q_id", "rank"]).values.tolist()


def test_ivf_exhaustive_equals_brute_force(spark, emb):
    """n_probe = n_lists ⇒ IVF must return exactly the brute-force top-k."""
    from wikidataquality_spark.operators.simsearch import ivf_topk

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = brute_force_topk(emb, queries, k=5).select("q_id", "vec_id", "rank").toPandas()
    ivf = ivf_topk(emb, queries, k=5, n_lists=4, n_probe=4).select("q_id", "vec_id", "rank").toPandas()
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(ivf) == key(exact)


def test_ivf_probe_subset_recall(spark, emb):
    """Restricted probing keeps ≥40% of the true top-5 on the synthetic
    near-uniform vectors (recall floor, not a quality claim)."""
    from wikidataquality_spark.operators.simsearch import ivf_topk

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = set(map(tuple, brute_force_topk(emb, queries, k=5).select("q_id", "vec_id").toPandas().values.tolist()))
    approx = set(map(tuple, ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4).select("q_id", "vec_id").toPandas().values.tolist()))
    assert len(approx & exact) / len(exact) >= 0.4


def test_train_centroids_deterministic_and_unit(spark, emb):
    """Same corpus + seed ⇒ identical centroids; spherical k-means ⇒ unit rows."""
    from wikidataquality_spark.operators.simsearch import train_centroids

    c1 = train_centroids(emb, n_lists=4, sample_n=256)
    c2 = train_centroids(emb, n_lists=4, sample_n=256)
    assert c1 == c2
    assert len(c1) == 4
    for c in c1:
        assert abs(float(np.linalg.norm(c)) - 1.0) < 1e-9


def test_train_centroids_cached_hits_and_invalidates(spark, emb, sf001_dir, tmp_path, monkeypatch):
    """Train-once cache: a second call with the same data version returns the
    cached bank WITHOUT retraining; touching the source (new mtime) misses."""
    from wikidataquality_spark.operators import simsearch
    from wikidataquality_spark.operators.simsearch import (
        train_centroids,
        train_centroids_cached,
    )

    monkeypatch.setenv("TMPDIR", str(tmp_path))  # isolate the cache root
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    src = f"{sf001_dir}/embeddings.parquet"
    fresh = train_centroids(emb, n_lists=4, sample_n=256)
    c1 = train_centroids_cached(emb, src, n_lists=4, sample_n=256)
    assert c1 == fresh  # json round-trip is exact

    calls = []

    def spy(*a, **k):
        calls.append(1)
        return fresh

    monkeypatch.setattr(simsearch, "train_centroids", spy)
    c2 = train_centroids_cached(emb, src, n_lists=4, sample_n=256)
    assert c2 == fresh and calls == []  # cache hit: no retrain

    # a changed data version (copied file ⇒ new mtime) forces a retrain
    import shutil

    src2 = str(tmp_path / "embeddings2.parquet")
    shutil.copytree(src, src2) if __import__("os").path.isdir(src) else shutil.copy(src, src2)
    c3 = train_centroids_cached(emb, src2, n_lists=4, sample_n=256)
    assert c3 == fresh and calls == [1]


def test_assign_cells_plan_has_no_exchange(spark, emb):
    """r03 VERDICT #1 gate: cell assignment must be row-local — the physical
    plan may contain NO Exchange and NO Window (the old crossJoin+row_number
    shape shuffled an N×n_lists expansion just to take an argmin)."""
    import contextlib
    import io

    from wikidataquality_spark.operators.simsearch import (
        assign_cells,
        train_centroids,
    )

    cents = train_centroids(emb, n_lists=4, sample_n=256)
    for n_keep in (1, 3):
        out = assign_cells(emb, cents, "embedding", "vec_id", n_keep)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "Window" not in plan, plan


def test_assign_cells_matches_numpy_argmax(spark, emb):
    """HOF argmax routing equals the numpy nearest-centroid (by cosine)."""
    from wikidataquality_spark.operators.simsearch import (
        assign_cells,
        train_centroids,
    )

    cents = train_centroids(emb, n_lists=4, sample_n=256)
    got = {
        r["vec_id"]: r["_cell"]
        for r in assign_cells(emb, cents, "embedding", "vec_id", 1).collect()
    }
    C = np.asarray(cents)  # unit rows
    for r in emb.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        sims = C @ v / np.linalg.norm(C, axis=1)
        assert got[r["vec_id"]] == int(sims.argmax()) + 1


def test_assign_cells_null_vector_goes_to_cell_zero(spark):
    from wikidataquality_spark.operators.simsearch import assign_cells

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = {r["vec_id"]: r["_cell"] for r in assign_cells(df, cents, "embedding", "vec_id", 1).collect()}
    assert rows[1] == 1
    assert rows[2] == 0  # NULL vector: unprobeable cell, drops out of ANN
    assert rows[3] == 0  # ragged vector likewise


def test_degenerate_vectors_never_rank_or_pair(spark):
    """r04 review: 0/0 cosine is NaN; Spark sorts NaN FIRST under desc and
    evaluates NaN >= t as TRUE, so an unguarded zero-norm (or NaN-entry)
    embedding would be every query's #1 neighbor AND pass every threshold.
    cosine() must yield NULL for them, and the topk/threshold operators must
    emit no row involving them."""
    from wikidataquality_spark.operators.simsearch import (
        embedding_neardup_pairs,
        ivf_topk,
        lsh_neardup_pairs,
    )

    base = [0.0] * 63
    rows = [
        (0, [1.0] + base),
        (1, [0.9] + [0.1] + [0.0] * 62),
        (2, [0.0] * 64),               # zero norm -> 0/0
        (3, [float("nan")] + base),    # NaN entry, positive norm
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    got = brute_force_topk(emb, queries, k=4).collect()
    bad = {2, 3}
    assert got, "valid pairs must still rank"
    for r in got:
        assert r["q_id"] not in bad and r["vec_id"] not in bad
        assert r["cos_sim"] == r["cos_sim"]  # no NaN survives

    ivf = ivf_topk(emb, queries, k=4, n_lists=2, n_probe=2)
    for r in ivf.collect():
        assert r["q_id"] not in bad and r["vec_id"] not in bad

    for fn in (embedding_neardup_pairs, lsh_neardup_pairs):
        pairs = fn(emb, threshold=0.5).collect()
        assert all(r["id_a"] not in bad and r["id_b"] not in bad for r in pairs)
        assert any(
            {r["id_a"], r["id_b"]} == {0, 1} for r in pairs
        ), f"{fn.__name__}: the genuine near-dup pair must survive"


def test_ivf_nprobe1_bad_query_returns_nothing(spark):
    """r04 review: with n_probe=1 probes use the SAME fold-to-cell-0 path as
    the data side, so a NULL/ragged query used to equi-join the data side's
    cell-0 rows and return NULL-cosine 'neighbors'."""
    from wikidataquality_spark.operators.simsearch import ivf_topk

    emb = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [0.5] * 64), (2, None), (3, [1.0] * 7)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0] * 64), (101, None), (102, [2.0] * 3)],
        "q_id long, q_vec array<double>",
    )
    got = ivf_topk(emb, queries, k=5, n_lists=2, n_probe=1).collect()
    assert {r["q_id"] for r in got} == {100}
    assert {r["vec_id"] for r in got} <= {0, 1}
    assert all(r["cos_sim"] is not None for r in got)


def test_train_centroids_cached_rejects_missing_path(spark, emb, tmp_path):
    """r04 review: a typo'd source path hashed a CONSTANT cache key (empty
    file listing), silently serving one stale centroid bank for any corpus."""
    from wikidataquality_spark.operators.simsearch import train_centroids_cached

    with pytest.raises(ValueError, match="no data files"):
        train_centroids_cached(emb, str(tmp_path / "nope.parquet"))


def test_train_centroids_empty_cluster_reseeds_distinct(spark):
    """r04 review: every empty cluster used to reseed to the SAME farthest
    point, making duplicate centroids whose higher cell id the strictly-
    greater router starves forever. Two tight far-apart pairs with k=4 force
    >=2 empty clusters in iteration 1; all 4 centroids must stay distinct."""
    from wikidataquality_spark.operators.simsearch import train_centroids

    dim = 64
    pts = []
    for i, sign in enumerate([1.0, 1.0, -1.0, -1.0]):
        v = [0.0] * dim
        v[0] = sign
        v[1] = 0.01 * (i % 2)  # tiny within-pair spread
        pts.append((i, v))
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = train_centroids(emb, n_lists=4, dim=dim, sample_n=4, iters=4)
    assert len(cents) == 4
    uniq = {tuple(np.round(c, 9)) for c in cents}
    assert len(uniq) == 4, "reseeded empty clusters must get distinct points"


def test_train_centroids_distributed_improves_fit(spark, emb):
    """Full-corpus Lloyd refinement must tighten the spherical k-means
    objective (mean cosine of each vector to its assigned centroid) over
    the k-means++ seeds it starts from, and end unit-norm."""
    from wikidataquality_spark.operators.simsearch import (
        assign_cells,
        train_centroids,
        train_centroids_distributed,
    )

    seeds = train_centroids(emb, n_lists=4, dim=64, iters=0, seed=13)
    trained = train_centroids_distributed(emb, n_lists=4, dim=64, iters=4, seed=13)
    assert len(trained) == 4 and all(len(c) == 64 for c in trained)
    for c in trained:
        assert np.linalg.norm(c) == pytest.approx(1.0, abs=1e-9)

    def mean_cos(cents):
        a = assign_cells(emb, cents, "embedding", "vec_id", 1).filter("_cell != 0")
        # _cell_scores' score = dot/‖c‖; with unit centroids and the row norm
        # divided out this is the cosine to the assigned centroid
        from wikidataquality_spark.operators.simsearch import cosine

        lit = [
            F.array(*[F.lit(float(x)) for x in c]) for c in cents
        ]
        cos = cosine(
            F.col("embedding"),
            F.element_at(F.array(*lit), F.col("_cell").cast("int")),
        )
        row = a.select(F.avg(cos).alias("m")).collect()[0]
        return row["m"]

    base, refined = mean_cos(seeds), mean_cos(trained)
    assert refined > base  # Lloyd on the full corpus beats raw seeds


def test_train_centroids_distributed_deterministic_fixed_partitioning(spark, emb):
    from wikidataquality_spark.operators.simsearch import train_centroids_distributed

    one = emb.coalesce(1)
    a = train_centroids_distributed(one, n_lists=4, dim=64, iters=2, seed=13)
    b = train_centroids_distributed(one, n_lists=4, dim=64, iters=2, seed=13)
    assert a == b  # bit-identical for a fixed partitioning


def test_train_centroids_distributed_total_on_poisoned_corpus(spark, emb):
    """One NaN-entry / zero / Inf-entry / NULL row must not poison the bank
    (r04 review: Spark compares NaN greater than any number, so an unguarded
    NaN norm passed `_nrm > 0`, went NaN through the mean, and the NaN
    centroid then won every argmax — the whole corpus collapsed to one
    cell). The trained bank stays finite and cells stay populated."""
    from pyspark.sql import Row

    from wikidataquality_spark.operators.simsearch import (
        assign_cells,
        train_centroids_distributed,
    )

    bad = spark.createDataFrame(
        [
            Row(vec_id=90001, embedding=[float("nan")] + [1.0] * 63),
            Row(vec_id=90002, embedding=[0.0] * 64),
            Row(vec_id=90003, embedding=[float("inf")] + [1.0] * 63),
            Row(vec_id=90004, embedding=None),
            Row(vec_id=90005, embedding=[1.0] * 10),  # ragged
        ]
    )
    poisoned = emb.select("vec_id", "embedding").unionByName(bad)
    cents = train_centroids_distributed(poisoned, n_lists=4, dim=64, iters=3, seed=13)
    flat = np.asarray(cents)
    assert np.isfinite(flat).all()
    cells = (
        assign_cells(emb, cents, "embedding", "vec_id", 1)
        .groupBy("_cell")
        .count()
        .collect()
    )
    assert len(cells) > 1  # corpus did not collapse into one cell


def test_train_centroids_distributed_init_longer_than_n_lists(spark, emb):
    """A caller-supplied init sizes the bank (len(init) wins over n_lists) —
    formerly an accumulator IndexError."""
    from wikidataquality_spark.operators.simsearch import (
        train_centroids,
        train_centroids_distributed,
    )

    init = train_centroids(emb, n_lists=6, dim=64, iters=0, seed=13)
    out = train_centroids_distributed(
        emb, n_lists=4, dim=64, iters=1, seed=13, init=init
    )
    assert len(out) == 6

"""Pair-similarity scale paths: the prefix-filter Jaccard join must be
EXACTLY the brute-force set (lossless filtering), and the LSH near-dup pair
join must match its inlined-constant SQL twin bit-for-bit (deterministic
bucketing) while keeping exact precision vs brute force."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.simsearch import (
    embedding_neardup_pairs,
    lsh_neardup_pairs,
    lsh_neardup_pairs_sql,
)
from wikidataquality_spark.operators.textstats import (
    jaccard_pairs_prefix_filtered,
    ngram_jaccard,
    word_ngrams,
)


@pytest.mark.parametrize("threshold", [0.4, 0.6, 0.8])
def test_prefix_filter_equals_brute_force(spark, sf0001_dir, threshold):
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    got = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in jaccard_pairs_prefix_filtered(docs, threshold).collect()
    )
    g = docs.select(
        "doc_id",
        F.array_distinct(word_ngrams(F.col("text"), 3)).alias("g"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("nw"),
    ).filter("nw >= 3")
    a = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    bf = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", ngram_jaccard(F.col("ga"), F.col("gb")))
        .filter(F.col("j") >= threshold)
        .collect()
    )
    want = sorted((r["id_a"], r["id_b"], round(r["j"], 6)) for r in bf)
    assert got == want and len(got) > 0


def test_prefix_filter_keeps_exact_threshold_pair(spark):
    """A pair whose Jaccard is EXACTLY the threshold must be emitted (J ≥ t).
    The natural corpus almost never lands on J = t, so the FP-boundary
    hazard in prefix_len/alpha (ceil of a mathematically-integer double,
    guarded by the ε) would go unnoticed by the corpus tests.
    A='a b c d e f' and B='z a b c d e' share trigrams {abc,bcd,cde} of a
    5-gram union: J = 3/5 = 0.6 exactly."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "z a b c d e")], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in jaccard_pairs_prefix_filtered(docs, 0.6).collect()
    }
    assert got == {(1, 2, 0.6)}
    # strictly above the exact value → pruned
    assert jaccard_pairs_prefix_filtered(docs, 0.61).count() == 0


@pytest.mark.parametrize("seed,threshold", [(1, 0.6), (2, 0.75)])
def test_prefix_filter_fuzz_equals_brute_force(spark, seed, threshold):
    """Seeded fuzz over a high-overlap tiny-vocab corpus: doc gram-set sizes
    4-10 sweep the integer-t·|g| cases and the rarest-first ordering is
    exercised with many ties — the lossless contract must hold exactly."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(9)]
    docs = []
    for i in range(20):
        base = [rng.choice(vocab) for _ in range(rng.randint(6, 12))]
        docs.append((2 * i, " ".join(base)))
        # planted near-dup: mutate 0-2 positions → Jaccard spans a dense
        # range around any threshold, including exact-boundary values
        mut = list(base)
        for _ in range(rng.randint(0, 2)):
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
        docs.append((2 * i + 1, " ".join(mut)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in jaccard_pairs_prefix_filtered(df, threshold).collect()
    )
    g = df.select(
        "doc_id",
        F.array_distinct(word_ngrams(F.col("text"), 3)).alias("g"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("nw"),
    ).filter("nw >= 3")
    a = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    bf = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", ngram_jaccard(F.col("ga"), F.col("gb")))
        .filter(F.col("j") >= threshold)
        .collect()
    )
    want = sorted((r["id_a"], r["id_b"], round(r["j"], 6)) for r in bf)
    assert got == want and len(want) > 0


def test_lsh_pairs_match_sql_twin_and_are_precise(spark, sf0001_dir):
    e = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    got = sorted(
        (r["id_a"], r["id_b"], round(r["cos_sim"], 4))
        for r in lsh_neardup_pairs(e, threshold=0.4).select(
            "id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf0001_dir}/embeddings.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(lsh_neardup_pairs_sql(0.4)).fetchall())
    assert got == want and len(got) > 0
    # precision is exact: every emitted pair is in the brute-force set
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(e, threshold=0.4).collect()
    }
    assert {(a, b) for a, b, _ in got} <= exact


def test_lsh_pairs_plan_is_equi_join(spark, sf0001_dir):
    e = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    plan = lsh_neardup_pairs(e, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_pairs_tolerate_null_and_ragged_vectors(spark):
    """NULL / wrong-length embeddings must not abort the mapInPandas task
    (np.stack on a ragged batch raises): they bucket to 0 — the Column
    path's NULL-dot behavior — and can never pass the cosine verify, so
    the valid vectors' pair set is unchanged."""
    import math

    from wikidataquality_spark.operators.simsearch import lsh_bucket_ids, lsh_pair_tables

    dim = 8
    base = [1.0 if i == 0 else 0.1 for i in range(dim)]
    near = [1.0 if i == 0 else 0.11 for i in range(dim)]
    rows = [
        (0, base),
        (1, near),
        (2, None),          # NULL vector
        (3, base[: dim - 2]),  # ragged (short) vector
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(e, threshold=0.9, dim=dim).collect()
    }
    assert pairs == {(0, 1)}
    norm = math.sqrt(sum(x * x for x in base)) * math.sqrt(sum(x * x for x in near))
    assert sum(a * b for a, b in zip(base, near)) / norm >= 0.9

    buckets = lsh_bucket_ids(e, lsh_pair_tables(dim), vec_col="embedding")
    bad = buckets.filter(F.col("vec_id").isin(2, 3)).collect()
    assert bad and all(r["_bucket"] == 0 for r in bad)

    # SQL-twin parity on the SAME hostile input: DuckDB's list_zip pads the
    # short side with NULL and list_aggregate('sum') ignores NULLs, so
    # without the explicit wrong-length CASE the twin would compute real
    # sign buckets (and real cosines) where Spark emits bucket 0 / NULL
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
        ),
    )
    want = sorted(
        (r[0], r[1]) for r in
        con.execute(lsh_neardup_pairs_sql(0.9, dim=dim)).fetchall()
    )
    assert want == sorted(pairs)


def test_lsh_pairs_verify_runs_parallel(spark, sf0001_dir):
    """Emit-once leaves NO exchange between the bucket checkpoint and the
    final filter, so the compute-dense fan-out join + cosine verify runs at
    the checkpoint RDD's partitioning. A tiny parquet source is ONE input
    split; without the guard repartition the whole verify serialized onto
    one core (measured 4.4s vs 1.5s at sf0.1). The final stage is narrow
    all the way down, so the result's partition count IS the checkpoint's."""
    e = spark.read.parquet(f"{sf0001_dir}/embeddings.parquet")
    out = lsh_neardup_pairs(e, threshold=0.5)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_lsh_pairs_degenerate_hub_excluded_and_twin_agrees(spark):
    """Zero-norm / NaN-entry vectors hash to constant buckets in every
    table: m of them meet m²/2 times in the bucket join, all verify-
    filtered — a pure-waste quadratic hub at crawl scale. lsh_bucket_arrays
    flags them _pairable=false and the pair operator drops them pre-join
    (pair set unchanged). The SQL twin needs explicit nrm/isnan guards:
    DuckDB evaluates NaN >= t as TRUE, so an unguarded NaN-entry cosine
    would emit pairs Spark rejects (r04 review)."""
    import math

    import pandas as pd

    from wikidataquality_spark.operators.simsearch import (
        lsh_bucket_arrays,
        lsh_pair_tables,
    )

    dim = 8
    base = [1.0 if i == 0 else 0.1 for i in range(dim)]
    near = [1.0 if i == 0 else 0.11 for i in range(dim)]
    rows = [
        (0, base),
        (1, near),
        (2, [0.0] * dim),                      # zero norm
        (3, [0.0] * dim),                      # zero norm (hub partner)
        (4, [math.nan] + [1.0] * (dim - 1)),   # NaN entry, positive norm
        (5, [math.nan] + [1.0] * (dim - 1)),   # identical NaN twin
        (6, None),                             # NULL
        (7, base[: dim - 2]),                  # ragged
        # TWO equal-length wrong-dim vectors with high raw cosine: excluded
        # by contract on BOTH engines — they cannot be LSH-hashed for dim-D
        # planes, so a pair between them would be an accident of the
        # constant fallback bucket, not an ANN result (r04 review: the SQL
        # twin previously accepted such pairs via its bare equal-length
        # check while Spark rejected them)
        (8, near[: dim - 2]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    marks = {
        r["vec_id"]: r["_pairable"]
        for r in lsh_bucket_arrays(e, lsh_pair_tables(dim)).collect()
    }
    assert marks == {0: True, 1: True, 2: False, 3: False, 4: False, 5: False, 6: False, 7: False, 8: False}

    got = sorted(
        (r["id_a"], r["id_b"]) for r in lsh_neardup_pairs(e, threshold=0.5, dim=dim).collect()
    )
    assert got == [(0, 1)]

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
        ),
    )
    want = sorted(
        (r[0], r[1]) for r in con.execute(lsh_neardup_pairs_sql(0.5, dim=dim)).fetchall()
    )
    assert want == got

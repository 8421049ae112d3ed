"""HLL sketch gates: accuracy vs exact, cross-run mergeability, union
idempotence (re-folding an included run moves nothing), parquet round-trip
of the binary artifact, and grouped sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidataquality_spark.operators.distinct_sketch import (
    distinct_sketches,
    union_estimate,
)


def _urls(spark, lo, hi, dups=1):
    rows = [(f"https://h{i % 97}.example/p/{i}",) for i in range(lo, hi)] * dups
    return spark.createDataFrame(rows, "url string")


def test_estimate_accuracy_and_dup_insensitivity(spark):
    n = 20000
    df = _urls(spark, 0, n, dups=3)  # every url seen 3× — distinct unchanged
    est = union_estimate(distinct_sketches(df, "url")).first()["distinct_estimate"]
    assert abs(est - n) / n < 0.05  # lg_k 12 ⇒ ~1.6% rse; 5% is ample


def test_cross_run_union_equals_whole_and_is_idempotent(spark, tmp_path):
    runs = [_urls(spark, 0, 8000), _urls(spark, 6000, 14000), _urls(spark, 12000, 20000)]
    # each "run" persists its few-KB artifact; later questions union the
    # artifacts instead of re-scanning the runs (binary round-trips parquet)
    p = str(tmp_path / "sketches")
    sk = runs[0].sparkSession.createDataFrame([], distinct_sketches(runs[0], "url").schema)
    for r in runs:
        sk = sk.unionByName(distinct_sketches(r, "url"))
    sk.write.mode("overwrite").parquet(p)
    stored = runs[0].sparkSession.read.parquet(p)

    est_union = union_estimate(stored).first()["distinct_estimate"]
    assert abs(est_union - 20000) / 20000 < 0.05  # overlaps not double-counted

    # idempotence: folding run 0's sketch in twice changes nothing
    doubled = stored.unionByName(distinct_sketches(runs[0], "url"))
    est_doubled = union_estimate(doubled).first()["distinct_estimate"]
    assert est_doubled == est_union


def test_pipeline_url_sketches_accumulate_across_runs(spark, tmp_path):
    """--url-sketches writes one run-scoped artifact dir per run; unioning
    every stored sketch answers distinct-urls-across-all-runs without
    re-reading either corpus."""
    import json
    import sys
    from io import StringIO

    # tools dir is on sys.path via conftest
    import run_pipeline

    from wikidataquality_spark.datagen import generate_pages

    met = str(tmp_path / "met")
    all_urls = set()
    for run, (lo, hi) in enumerate([(0, 60), (40, 100)]):  # overlapping crawls
        pdf = generate_pages(100, seed=17).iloc[lo:hi]
        all_urls |= set(pdf["url"])
        src = str(tmp_path / f"pages{run}")
        spark.createDataFrame(pdf).write.parquet(src)
        buf, old = StringIO(), sys.stdout
        sys.stdout = buf
        try:
            rc = run_pipeline.main(
                ["--input", src, "--output", str(tmp_path / f"out{run}"),
                 "--metrics", met, "--url-sketches", "--run-id", f"r{run}"]
            )
        finally:
            sys.stdout = old
        assert rc == 0
        assert json.loads(buf.getvalue().splitlines()[-1])["status"] == "ok"

    stored = spark.read.parquet(f"{met}_url_sketches/r0", f"{met}_url_sketches/r1")
    est = union_estimate(stored).first()["distinct_estimate"]
    # 100 distinct urls across both runs (overlap not double-counted);
    # HLL at this cardinality is essentially exact
    assert est == len(all_urls) == 100

    # a reused run-id fails LOUDLY: sketch artifacts accumulate one-per-run
    # and are never overwritten (clobbering would shrink later unions)
    import pytest

    buf, old = StringIO(), sys.stdout
    sys.stdout = buf
    try:
        with pytest.raises(ValueError, match="already exists"):
            run_pipeline.main(
                ["--input", str(tmp_path / "pages0"),
                 "--output", str(tmp_path / "out_reuse"),
                 "--metrics", met, "--url-sketches", "--run-id", "r0"]
            )
    finally:
        sys.stdout = old


def test_grouped_sketches_merge_per_group(spark, sf0001_dir):
    docs = spark.read.parquet(f"{sf0001_dir}/documents.parquet")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    parts = distinct_sketches(half_a, "doc_id", ["source"]).unionByName(
        distinct_sketches(half_b, "doc_id", ["source"])
    )
    merged = {
        r["source"]: r["distinct_estimate"]
        for r in union_estimate(parts, ["source"]).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    assert set(merged) == set(exact)
    for src, n in exact.items():
        assert abs(merged[src] - n) / max(n, 1) < 0.05
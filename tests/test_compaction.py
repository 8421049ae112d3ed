"""Compaction gates: fragmented partitions collapse to their target file
count with rows and values byte-identical, the plan is idempotent (second
pass = no work), manifests/resume state stay valid, and spared partitions
are untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wikidataquality_spark.io.catalog import (
    completed_partitions,
    read_manifest,
    write_partitioned,
)
from wikidataquality_spark.io.compaction import (
    compact_dataset,
    partition_file_stats,
    plan_compaction,
)


def _fragmented_dataset(spark, out):
    rows = [(f"u{i}", f"2025-01-{(i % 2) + 1:02d}", i, f"text {i}") for i in range(400)]
    df = spark.createDataFrame(
        rows, "url string, partition string, x long, text string"
    ).repartition(16)  # 16 tiny files per partition directory
    return write_partitioned(df, out, run_id="frag1", input_snapshot="snapA")


def test_compact_reduces_files_preserves_rows_and_manifest(spark, tmp_path):
    out = str(tmp_path / "t")
    entry = _fragmented_dataset(spark, out)
    before = partition_file_stats(out)
    assert all(n > 1 for n, _ in before.values())
    rows_before = sorted(map(tuple, spark.read.parquet(out).collect()))
    manifest_before = read_manifest(out)

    done = compact_dataset(spark, out, target_file_mb=64)
    assert set(done) == set(before)
    after = partition_file_stats(out)
    for part, (n_before, _) in before.items():
        n_after, _ = after[part]
        assert n_after == 1 < n_before  # tiny bytes → single target file
    # rows and values byte-identical; manifest + resume state untouched
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == rows_before
    assert read_manifest(out) == manifest_before
    assert completed_partitions(out) == {"2025-01-01", "2025-01-02"}
    assert entry["rows"] == 400

    # idempotent: nothing left to do
    assert plan_compaction(out, target_file_mb=64) == []
    assert compact_dataset(spark, out, target_file_mb=64) == {}


def test_compact_spares_already_compact_partitions(spark, tmp_path):
    out = str(tmp_path / "t2")
    _fragmented_dataset(spark, out)
    # compact one partition by hand first
    compact_dataset(spark, out, target_file_mb=64)
    stats = partition_file_stats(out)
    # append a new fragmented partition; the compacted ones must not be
    # rewritten (their file mtimes stay put)
    extra = spark.createDataFrame(
        [(f"v{i}", "2025-01-03", i, "t") for i in range(100)],
        "url string, partition string, x long, text string",
    ).repartition(8)
    write_partitioned(extra, out, run_id="frag2", input_snapshot="snapB")
    mtime_before = {
        p: os.path.getmtime(os.path.join(out, f"partition={p}")) for p in stats
    }
    plans = plan_compaction(out, target_file_mb=64)
    assert [p["partition"] for p in plans] == ["2025-01-03"]
    compact_dataset(spark, out, target_file_mb=64)
    for p, t in mtime_before.items():
        assert os.path.getmtime(os.path.join(out, f"partition={p}")) == t
    assert partition_file_stats(out)["2025-01-03"][0] == 1
    assert spark.read.parquet(out).count() == 500
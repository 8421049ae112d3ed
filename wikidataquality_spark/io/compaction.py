"""Small-file compaction for written datasets — the maintenance half of the
layout story (io/layout.py owns write-time clustering; this owns the
after-the-fact rewrite).

Why it exists at scale: incremental runs, streaming micro-batches, and
high shuffle-partition counts leave partitions holding hundreds of tiny
parquet files; every future scan then pays per-file open/footer/listing
cost and loses row-group pruning leverage. The fix is the standard
lakehouse rewrite: per directory partition, read → coalesce to the
target-size file count → atomic swap. coalesce, never repartition — the
rewrite is the one operation that must NOT shuffle (it narrows existing
partitions in place).

The swap is check-stage-publish under the repo's single locking seam
(io/locking.py): the staged rewrite becomes live via two renames under the
exclusive lock. Same documented single-host semantics as every other
publish in the repo — an object-store/Iceberg deployment replaces the swap
with a rewrite-files commit (Iceberg's RewriteDataFiles), which this
module's per-partition planning maps onto directly. Manifests are
untouched: compaction changes file layout, never rows, so resume state and
row counts stay valid.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from wikidataquality_spark.io.layout import DEFAULT_TARGET_FILE_MB, cluster_partition_count
from wikidataquality_spark.io.locking import exclusive_lock


def _data_files(d: str) -> list[str]:
    return [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(".")
    ]


def partition_file_stats(table_dir: str, partition_col: str = "partition") -> dict:
    """partition value → (n_files, total_bytes) from one directory listing
    (no data read)."""
    out = {}
    prefix = f"{partition_col}="
    if not os.path.isdir(table_dir):
        return out
    for name in sorted(os.listdir(table_dir)):
        d = os.path.join(table_dir, name)
        if not (name.startswith(prefix) and os.path.isdir(d)):
            continue
        files = _data_files(d)
        out[name[len(prefix) :]] = (
            len(files),
            sum(os.path.getsize(f) for f in files),
        )
    return out


def plan_compaction(
    table_dir: str,
    partition_col: str = "partition",
    target_file_mb: int = DEFAULT_TARGET_FILE_MB,
) -> list[dict]:
    """Partitions whose file count exceeds what their bytes need — the
    work list, from listing alone. Idempotent: a just-compacted partition
    plans zero work."""
    plans = []
    for part, (n_files, total_bytes) in partition_file_stats(
        table_dir, partition_col
    ).items():
        target = cluster_partition_count(total_bytes / 1e6, target_file_mb)
        if n_files > target:
            plans.append(
                {
                    "partition": part,
                    "n_files": n_files,
                    "total_bytes": total_bytes,
                    "target_files": target,
                }
            )
    return plans


def compact_dataset(
    spark: SparkSession,
    table_dir: str,
    partition_col: str = "partition",
    target_file_mb: int = DEFAULT_TARGET_FILE_MB,
) -> dict:
    """Execute the plan: per over-fragmented partition, read → coalesce to
    target_files (narrowing, zero shuffle) → staged rewrite → locked
    rename swap. Returns {partition: (files_before, files_after)}."""
    done = {}
    for p in plan_compaction(table_dir, partition_col, target_file_mb):
        part_dir = os.path.join(table_dir, f"{partition_col}={p['partition']}")
        # staging/lock/old names are "_"-prefixed: Spark's file listing and
        # partition discovery ignore _ and . prefixed entries, so a reader
        # of the table never trips over compaction's working files (a bare
        # `partition=X.lock` sibling was read as a data file and failed
        # footer parsing)
        scratch = os.path.join(table_dir, f"_compact_{os.getpid()}_{p['partition']}")
        (
            spark.read.parquet(part_dir)
            .coalesce(p["target_files"])
            .write.mode("overwrite")
            .parquet(scratch)
        )
        with exclusive_lock(os.path.join(table_dir, f"_lock_{p['partition']}")):
            old = f"{scratch}.old"
            os.rename(part_dir, old)
            os.rename(scratch, part_dir)
            shutil.rmtree(old)
        done[p["partition"]] = (p["n_files"], len(_data_files(part_dir)))
    return done

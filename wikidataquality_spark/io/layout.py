"""Write-time file layout for data skipping — the 100 TB scan-pruning lever.

Parity: the reference's per-entity SQL lookups lean on MySQL btree indexes
(ref≈sql/create_wbqc_constraints.sql:~1-20 keys wbqc_constraints by pid);
a lake has no btrees — its "index" is file/row-group MIN/MAX statistics,
and those are only selective if the writer CLUSTERS values. A 100 TB corpus
written in arrival order has every host in every file, so `WHERE host = x`
scans 100 TB; the same corpus range-clustered by host answers it from the
handful of files whose [min, max] covers x. Iceberg metadata pruning and
plain parquet row-group pruning both feed on exactly this layout, so the
module applies unchanged to either table format (io/catalog.py seam).

`write_clustered` pays ONE extra exchange at write time (range repartition:
Spark samples the cluster keys to pick balanced boundaries) + an in-memory
sort per partition; every future selective scan gets the skipping for free.
This is the classic lakehouse trade and it is overwhelmingly right for
write-once/read-many corpora. For multi-column skipping needs (host AND
date), partition_by handles the coarse dimension (directory pruning) and
cluster_by the fine one (file/row-group pruning) — the standard layout:
`partition_by=['date'], cluster_by=['host']`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# One range partition becomes (at least) one parquet file per directory
# partition. ~128 MB uncompressed-row target is the standard lake file size:
# big enough that footer/open overhead amortizes, small enough that one task
# (and one retry) owns a bounded unit.
DEFAULT_TARGET_FILE_MB = 128


def cluster_partition_count(
    approx_total_mb: float, target_file_mb: int = DEFAULT_TARGET_FILE_MB
) -> int:
    """Files needed to hit the target size — the compaction knob: a
    10^12-doc pipeline computes approx_total_mb from the write manifest's
    per-partition row counts × sampled row width (io/catalog.py records
    both), never from a second full scan."""
    import math

    # true ceiling on the float (int-truncating first undercounts any
    # fractional total just above a target multiple — r04 session review)
    return max(1, math.ceil(approx_total_mb / target_file_mb))


def cluster_for_skipping(
    df: DataFrame,
    cluster_by: list[str],
    n_files: int | None = None,
) -> DataFrame:
    """Range-repartition on the cluster keys + sort within partitions:
    after this, each output file owns a contiguous key range, so its
    parquet MIN/MAX stats (and Iceberg manifest ranges) are tight and
    selective scans skip whole files. n_files=None keeps the session's
    shuffle-partition count (the sandbox default); production sizes it with
    cluster_partition_count."""
    cols = [df[c] for c in cluster_by]
    parted = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    # secondary in-file sort keeps ROW-GROUP stats tight too (a file holds
    # several row groups; without the sort only the file envelope is tight)
    return parted.sortWithinPartitions(*cols)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    partition_by: list[str] | None = None,
    n_files: int | None = None,
) -> None:
    """Materialize the clustered layout: directory partitions prune the
    coarse dimension, range-clustered files inside each prune the fine one."""
    writer = cluster_for_skipping(df, cluster_by, n_files=n_files).write.mode(
        "overwrite"
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

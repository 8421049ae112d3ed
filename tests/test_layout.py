"""Data-skipping layout gates: range-clustered files carry tight, mostly
disjoint MIN/MAX stats (the mechanical precondition every pruning layer —
parquet row-group, Iceberg manifest — feeds on), arrival-order files don't,
and the clustered layout is a pure re-arrangement (same rows)."""

from __future__ import annotations

import glob
import os
from collections import Counter

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from wikidataquality_spark.io.layout import (
    cluster_for_skipping,
    cluster_partition_count,
    write_clustered,
)


def _host_df(spark):
    from wikidataquality_spark.datagen import generate_pages

    pdf = generate_pages(600, seed=3)[["url", "warc_ts", "text"]]
    df = spark.createDataFrame(pdf)
    return df.withColumn("host", F.parse_url("url", F.lit("HOST")))


def _candidate_files(path: str, probe: str) -> tuple[int, int]:
    """(files whose host [min,max] covers probe, total data files) — the
    exact containment test file/row-group pruning performs."""
    hits = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        total += 1
        covered = False
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "host" and col.statistics is not None:
                    st = col.statistics
                    if st.min <= probe <= st.max:
                        covered = True
        hits += covered
    return hits, total


def test_clustered_layout_enables_file_skipping(spark, tmp_path):
    df = _host_df(spark)
    probe = df.groupBy("host").count().orderBy(F.desc("count")).first()["host"]

    plain = str(tmp_path / "arrival")
    df.repartition(8).write.parquet(plain)  # arrival-order layout
    clustered = str(tmp_path / "clustered")
    write_clustered(df, clustered, ["host"], n_files=8)

    plain_hits, plain_total = _candidate_files(plain, probe)
    clus_hits, clus_total = _candidate_files(clustered, probe)
    # arrival order: the most common host lands in (nearly) every file, so
    # nothing can be skipped; clustered: only the file(s) owning its range
    assert plain_hits >= plain_total - 1 >= 6
    assert clus_hits <= 2
    # and per-file host spread collapses: clustered files each own a narrow
    # slice of the host space instead of all of it
    def spread(path):
        per_file = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            t = pq.read_table(f, columns=["host"])
            if t.num_rows:
                per_file.append(len(set(t.column("host").to_pylist())))
        return per_file

    n_hosts = df.select("host").distinct().count()
    assert sum(spread(clustered)) <= n_hosts + 8  # ≤ one boundary share/file
    assert max(spread(plain)) > n_hosts // 2

    # pure re-arrangement: same rows, filtered reads agree
    a = sorted(r["url"] for r in spark.read.parquet(plain).filter(F.col("host") == probe).collect())
    b = sorted(r["url"] for r in spark.read.parquet(clustered).filter(F.col("host") == probe).collect())
    assert a == b and len(a) > 0
    assert spark.read.parquet(clustered).count() == 600


def test_cluster_partition_count_targets_file_size():
    assert cluster_partition_count(1) == 1
    assert cluster_partition_count(128) == 1
    assert cluster_partition_count(129) == 2
    assert cluster_partition_count(1000, target_file_mb=100) == 10


def test_cluster_with_directory_partitions(spark, tmp_path):
    from wikidataquality_spark.datagen import generate_pages

    # 2000 pages at 97 s spacing span ~2.2 days → several date directories
    pdf = generate_pages(2000, seed=4)[["url", "warc_ts", "text"]]
    df = (
        spark.createDataFrame(pdf)
        .withColumn("host", F.parse_url("url", F.lit("HOST")))
        .withColumn("date", F.to_date("warc_ts"))
    )
    out = str(tmp_path / "both")
    write_clustered(df, out, ["host"], partition_by=["date"], n_files=4)
    dirs = [d for d in os.listdir(out) if d.startswith("date=")]
    assert len(dirs) >= 2  # coarse dimension prunes by directory
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # fine dimension still clustered inside each directory
    one = os.path.join(out, dirs[0])
    hosts_per_file = []
    for f in glob.glob(os.path.join(one, "*.parquet")):
        t = pq.read_table(f, columns=["host"])
        if t.num_rows:
            hosts_per_file.append(Counter(t.column("host").to_pylist()))
    all_hosts = set().union(*[set(c) for c in hosts_per_file])
    assert sum(len(c) for c in hosts_per_file) <= len(all_hosts) + len(hosts_per_file)


def test_cluster_for_skipping_sorts_within_partitions(spark):
    df = _host_df(spark)
    part_rows = (
        cluster_for_skipping(df, ["host"], n_files=4)
        .select("host")
        .rdd.glom()
        .collect()
    )
    non_empty = [[r["host"] for r in p] for p in part_rows if p]
    assert len(non_empty) >= 2
    for p in non_empty:
        assert p == sorted(p)  # row-group stats stay tight inside files

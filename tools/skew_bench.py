"""Skew evidence: hot-host salting vs naive host partitioning.

BASELINE.json:6 mandates explicit salting for skewed domains. This bench
makes the effect measurable in isolation: a corpus where ~60% of pages sit
on ONE host is repartitioned by host either naively or salted
(operators/dedup.repartition_by_host_salted), then the expensive per-row
stage (the fused enrich UDF) runs on that layout. Naive partitioning pins
the hot host's 60% of all python work on a single task; salting spreads it
over n_salts tasks.

Prints one JSON line with wall seconds + max-partition share for both
layouts and appends a table to BASELINE.md.

Usage: python tools/skew_bench.py [n_pages] [cpus]   (default 60000, 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# top-level import: resolving this only AFTER the bench completes would
# discard minutes of measurements on an ImportError under `python -m` runs
from scaling_bench import replace_section  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from wikidataquality_spark.datagen import write_pages_parquet
    from wikidataquality_spark.deploy import ensure_shipped
    from wikidataquality_spark.operators.dedup import (
        host_of,
        repartition_by_host_salted,
    )
    from wikidataquality_spark.operators.enrich import enriched
    from wikidataquality_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=32, app_name="skew_bench")
    ensure_shipped(spark)

    from wikidataquality_spark.datagen import DATAGEN_VERSION
    from wikidataquality_spark.io.locking import user_cache_root

    # per-uid root like every other cache (write_pages_parquet itself
    # publishes through the locking seam)
    base = write_pages_parquet(
        os.path.join(
            user_cache_root("wdq_skew"), f"pages_{n_pages}_v{DATAGEN_VERSION}.parquet"
        ),
        n_pages,
        seed=42,
    )
    # deterministic skew injection: ~60% of urls rewritten onto ONE host
    pages = spark.read.parquet(base).withColumn(
        "url",
        F.when(
            F.pmod(F.xxhash64("url"), F.lit(10)) < 6,
            F.concat(F.lit("https://hot.example.com/p/"), F.xxhash64("url").cast("string")),
        ).otherwise(F.col("url")),
    )
    pages = pages.persist()
    pages.count()

    def heavy(df):
        """The python-heavy stage on the given partitioning. The aggregate
        references the UDF output so it cannot be pruned; the final agg is
        map-side partial + a 1-row exchange (no data shuffle)."""
        return (
            df.withColumn("_e", enriched("html"))
            .agg(F.max(F.col("_e.n_chars_stat")))
            .collect()
        )

    def partition_shares(df):
        rows = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        total = sum(r["count"] for r in rows)
        return max(r["count"] for r in rows) / total, len(rows)

    naive = pages.repartition(32, host_of("url"))
    salted = repartition_by_host_salted(pages, 32, hot_fraction=0.05, n_salts=16)

    # warm python workers once (spawn cost out of the comparison)
    heavy(pages.limit(2000))

    results = {}
    for name, df in [("naive_host", naive), ("salted_host", salted)]:
        share, n_parts = partition_shares(df)
        t0 = time.perf_counter()
        heavy(df)
        wall = time.perf_counter() - t0
        results[name] = {
            "wall_sec": round(wall, 2),
            "max_partition_share": round(share, 4),
            "n_partitions": n_parts,
        }

    speedup = round(results["naive_host"]["wall_sec"] / results["salted_host"]["wall_sec"], 2)
    out = {
        "metric": "skew_salting_speedup",
        "value": speedup,
        "unit": "x",
        "docs": n_pages,
        "cpus": cpus,
        **results,
    }
    print(json.dumps(out))

    baseline = os.path.join(REPO, "BASELINE.md")
    with open(baseline) as f:
        content = f.read()
    marker = "\n## Measured (skew salting)\n"
    table = (
        marker
        + f"\n{n_pages}-page corpus with ~60% of pages on one hot host, local[{cpus}],\n"
        "python-heavy enrich stage run on the repartitioned layout (no further\n"
        "shuffle). Salting = `repartition_by_host_salted` (hot hosts split over\n"
        "16 salts; cold hosts untouched):\n\n"
        "| layout | wall sec | max partition share |\n| --- | --- | --- |\n"
        f"| repartition(host) | {results['naive_host']['wall_sec']} | {results['naive_host']['max_partition_share']} |\n"
        f"| salted | {results['salted_host']['wall_sec']} | {results['salted_host']['max_partition_share']} |\n\n"
        f"**Speedup from salting: {speedup}×**\n"
    )
    with open(baseline, "w") as f:
        f.write(replace_section(content, marker, table))


if __name__ == "__main__":
    main()

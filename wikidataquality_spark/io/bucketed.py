"""Bucketed-table layout: the zero-shuffle co-located join path.

This is the 10^12-doc regime of the dedup rejoin (operators/dedup.py): when
the dup-flag set outgrows a broadcast, both the corpus and its flag/metadata
tables are written bucketed by the join key — `CLUSTERED BY (url) INTO N
BUCKETS SORTED BY (url)` — so a sort-merge join between them needs NO
exchange on either side: Spark matches bucket files pairwise and streams.

The same layout serves resume/incremental work: a re-validation of one
partition joins old flags to new pages bucket-by-bucket.

Sandbox note: bucketing metadata lives in the session catalog
(saveAsTable); spark.sql.warehouse.dir is pointed at /tmp by session.py.
On a production cluster this is the Hive/Glue/Iceberg-bucket-transform
equivalent — the plan shape below is what matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist df bucketed+sorted by key. n_buckets fixes the join-time
    parallelism contract — co-located joins require equal bucket counts on
    both sides, so treat it as a corpus-level constant (64 here; thousands at
    production scale)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "url",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With bucketing
    metadata present, the physical plan is SortMergeJoin with NO Exchange on
    either side (verified by tests/test_bucketed.py against the plan text).
    The merge hint pins sort-merge so a small side doesn't silently take the
    broadcast path and mask the bucketing contract."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, key, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains any Exchange (test helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan

"""Loaders for the driver-generated test tables (TESTDATA.md).

Mirrors the reference's external-data import jobs
(ref≈maintenance/UpdateExternalData.php:~20-150, SURVEY.md §2A″): in the
reference, dumps land in SQL tables; here every source is a columnar scan
Catalyst can prune/push into.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; column pruning + predicate pushdown are Catalyst's."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view (mirrors the DuckDB oracle
    setup). Individual tables may legitimately be absent (subset fixtures),
    but a dir where NOTHING resolves is a mistyped path — failing here beats
    a 'table not found' error far from the cause (r04 review)."""
    dfs = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    if not dfs:
        raise FileNotFoundError(
            f"register_views: no test tables found under {sf_dir!r} "
            f"(expected some of {TABLE_NAMES}) — mistyped sf_dir?"
        )
    return dfs

"""CSV / JSON / Parquet source & sink helpers with explicit schemas.

Parity: the reference ingests its rule config and external data from CSV/TSV
dumps (ref≈maintenance/UpdateConstraintsTable.php:~20-180,
ref≈maintenance/UpdateExternalData.php:~20-150). Here every reader takes an
EXPLICIT StructType — schema inference is a full extra pass over the data at
scale and is nondeterministic under schema drift (SURVEY.md §1.2's
"fixed schemas end-to-end" rule).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")  # corrupt rows fail loudly, never silently null
        # multiLine + explicit quote/escape: write_csv quotes embedded
        # newlines, so the reader must parse quoted multi-line records or any
        # free-text column (e.g. document bodies) splits rows under FAILFAST.
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    # RFC-4180 quoting (escape = double-quote) to mirror read_csv's options;
    # Spark's writer default escape is backslash, which the reader would
    # misparse for text columns containing quotes.
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def export_once(df: DataFrame, path: str, fmt: str) -> str:
    """Idempotent materialization of a DataFrame to csv/json (driver-harness
    fixture helper: lets a query exercise the csv/json read path against data
    derived from the canonical parquet)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        if fmt == "csv":
            write_csv(df, path)
        elif fmt == "json":
            write_json(df, path)
        else:
            raise ValueError(f"unknown fmt {fmt!r}")
    return path

"""CSV / JSON / Parquet / ORC / text / binary-file source & sink helpers
with explicit schemas.

Parity: the reference ingests its rule config and external data from CSV/TSV
dumps (ref≈maintenance/UpdateConstraintsTable.php:~20-180,
ref≈maintenance/UpdateExternalData.php:~20-150). Here every reader takes an
EXPLICIT StructType — schema inference is a full extra pass over the data at
scale and is nondeterministic under schema drift (SURVEY.md §1.2's
"fixed schemas end-to-end" rule).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    multi_line: bool = True,
) -> DataFrame:
    """multi_line=True (default) parses quoted embedded newlines — required
    for any free-text column (write_csv quotes them; under FAILFAST a
    non-multiLine read splits such rows). COST: a multiLine CSV file is
    NON-SPLITTABLE (one task parses the whole file), so corpus-scale CSV
    ingestion must either pre-shard inputs into many files (parallelism =
    file count, the layout tools/ emits) or pass multi_line=False for
    machine-generated CSV guaranteed free of embedded newlines, which
    restores intra-file split parallelism."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")  # corrupt rows fail loudly, never silently null
        .option("multiLine", str(multi_line).lower())
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


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC source (native in Spark, no extra jar): the other columnar lake
    format a webtext corpus commonly arrives in. Splittable, predicate
    pushdown and column pruning work exactly as for parquet."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw line-per-row text source (`value string`) — the WET-file shape of
    Common-Crawl-style dumps before any structure is imposed. Splittable on
    uncompressed/bzip2 inputs; one task per gzip member otherwise."""
    return spark.read.text(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-blob ingestion for the multimodal path: one row per file with
    (path, modificationTime, length, content:binary) — the natural way raw
    image/audio/video files enter the MEDIA_SCHEMA pipeline
    (operators/multimodal.py). Metadata columns (path/length) come from the
    file listing, so metadata-only pruning never reads blob bytes; at corpus
    scale prefer many small-to-medium files over a few giants (one file =
    one row = one task's memory)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def export_once(df: DataFrame, path: str, fmt: str) -> str:
    """Idempotent materialization of a DataFrame to csv/json (driver-harness
    fixture helper: lets a query exercise the csv/json read path against data
    derived from the canonical parquet).

    Routed through the locking seam's publish_dir (stage under flock, one
    atomic rename): the previous bare check-then-overwrite let two concurrent
    drivers (the driver gate + a local check_oracle run) write the SAME final
    directory, and the survivor's _SUCCESS made a torn mix trusted forever
    (r04 review)."""
    if fmt not in ("csv", "json"):
        raise ValueError(f"unknown fmt {fmt!r}")
    from wikidataquality_spark.io.locking import publish_dir

    write = write_csv if fmt == "csv" else write_json
    return publish_dir(path, lambda staging: write(df, staging))

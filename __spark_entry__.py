"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship quality-filter query at sf0.001 (smoke).
queries()      — every implemented operator from SURVEY.md §2 as a named plan.
oracle_sql()   — matching DuckDB SQL per query (omitted entries → rows-only).

Implementation lives in wikidataquality_spark/ (plans/driver_queries.py for
the query surface; operators/ + rules/ for the engine itself).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full validation DAG —
    heuristic stats → rule checks → violations array → keep/drop — returning
    EVERY document annotated with its stats and keep/drop decision (the
    non-destructive flag shape; consumers filter on `keep`)."""
    from wikidataquality_spark.deploy import ensure_shipped
    from wikidataquality_spark.operators.heuristics import with_doc_stats
    from wikidataquality_spark.plans.driver_queries import FLAGSHIP_RULES
    from wikidataquality_spark.rules.builder import apply_rules

    ensure_shipped(spark)

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    checked = apply_rules(with_doc_stats(docs), FLAGSHIP_RULES)
    return checked.select(
        "doc_id",
        "lang",
        "source",
        "n_chars_stat",
        "n_words_stat",
        "mean_word_len_stat",
        "stopword_ratio_stat",
        "distinct_word_ratio_stat",
        "keep",
        "violated_rules",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wikidataquality_spark.deploy import ensure_shipped
    from wikidataquality_spark.plans.driver_queries import QUERIES

    def _shipped(fn):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)  # UDF-bearing plans need the pkg on workers
            return fn(spark, sf_dir)

        return wrapper

    return {name: _shipped(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from wikidataquality_spark.plans.driver_queries import ORACLE

    return dict(ORACLE)

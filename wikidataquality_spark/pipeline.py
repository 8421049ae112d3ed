"""The document validation DAG — the engine's flagship pipeline.

Parity: DelegatingConstraintChecker driving all checkers over an entity
(ref≈includes/ConstraintCheck/DelegatingConstraintChecker.php:~40-200) +
EvaluateConstraintReportJob writing violations/statistics
(ref≈includes/EvaluateConstraintReportJob.php:~15-80), recast per
BASELINE.json:6/14/15 as:

  read pages → extract(html) → langid → perplexity → heuristics →
  dup marks (exact + MinHash) → rule checks → violations array →
  keep/drop + scrubbed text → metrics per partition

Stage order is cost-ordered: pure-SQL heuristics run in the same codegen'd
projection as the scan; the two pandas-UDF stages (langid, perplexity) share
one Python-worker pass; the only shuffles are the two dedup aggregations.

Output schema (FIXTURES.md "expected outputs"):
  result(url, warc_ts, lang, lang_pred, lang_conf, perplexity, keep,
         scrubbed_text, violations, violated_rules)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.operators.dedup import dup_marks
from wikidataquality_spark.operators.extract import extracted_text
from wikidataquality_spark.operators.heuristics import with_doc_stats
from wikidataquality_spark.operators.langid import langid_udf
from wikidataquality_spark.operators.perplexity import perplexity_udf
from wikidataquality_spark.operators.scrub import scrub_column
from wikidataquality_spark.rules.builder import apply_rules
from wikidataquality_spark.rules.model import Rule

ALLOWED_LANGS = ("en", "fr", "es", "de", "zh")

# The frozen production rule set (changing any threshold is a golden-fixture
# breaking change — see tests/test_pipeline.py).
PIPELINE_RULES: tuple[Rule, ...] = (
    Rule("mandatory.url", "mandatory", {"column": "url"}),
    Rule("mandatory.warc_ts", "mandatory", {"column": "warc_ts"}),
    Rule("format.url_scheme", "format", {"column": "url", "pattern": "^https?://", "mode": "must_match"}),
    Rule("one_of.lang_pred", "one_of", {"column": "lang_pred", "allowed": ",".join(ALLOWED_LANGS)}),
    Rule("range.lang_conf", "range", {"column": "lang_conf", "min": "0.2", "max": "1.0"}),
    Rule("range.perplexity", "range", {"column": "perplexity", "min": "0", "max": "10000"}),
    Rule("range.mean_word_len", "range", {"column": "mean_word_len_stat", "min": "1", "max": "12"}),
    Rule("range.doc_len", "range", {"column": "n_chars_stat", "min": "50", "max": "20000"}),
    Rule("range.symbol_ratio", "range", {"column": "symbol_ratio_stat", "min": "0", "max": "0.1"}),
    Rule("range.line_dup", "range", {"column": "distinct_line_ratio_stat", "min": "0.5", "max": "1.0"}),
    Rule("conflicts_with.blockwords", "conflicts_with", {"column": "text_extracted", "blocked": "badword,toxicword,slurword"}),
    Rule("unique_value.exact_dup", "flag", {"column": "is_exact_dup"}),
    Rule("unique_value.near_dup", "flag", {"column": "is_near_dup"}),
    # PII presence is recorded but scrubbed rather than dropped → soft.
    Rule("format.pii_email", "format", {"column": "text_extracted", "pattern": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "mode": "must_not_match"}, severity="soft"),
)


@dataclass
class PipelineConfig:
    rules: tuple[Rule, ...] = PIPELINE_RULES
    allowed_langs: tuple[str, ...] = ALLOWED_LANGS
    id_col: str = "url"
    extra: dict = field(default_factory=dict)


def validate(pages: DataFrame, config: PipelineConfig | None = None) -> DataFrame:
    """Full validation DAG over a pages DataFrame
    (url, warc_ts, html, text, lang). Returns every input row annotated with
    stats, model scores, dup flags, violations, keep, scrubbed_text."""
    cfg = config or PipelineConfig()

    # Stage 1 — extract (pandas UDF) + model stages (iterator pandas UDFs).
    # One select: all three UDFs run in the same Python-worker pass per batch.
    lid = langid_udf(F.col("text_extracted"))
    df = (
        pages.withColumn("text_extracted", extracted_text("html"))
        .withColumn("_lid", lid)
        .withColumn("perplexity", perplexity_udf(F.col("text_extracted")))
        .select(
            "*",
            F.col("_lid.lang_pred").alias("lang_pred"),
            F.col("_lid.lang_conf").alias("lang_conf"),
        )
        .drop("_lid")
    )

    # Stage 2 — pure-SQL heuristics over the extracted text (codegen).
    df = with_doc_stats(df, text_col="text_extracted")

    # Stage 3 — cross-row dedup marks (the shuffle stages).
    df = dup_marks(df, text_col="text_extracted", id_col=cfg.id_col)

    # Stage 4 — rule checks → violations array → keep decision (codegen).
    df = apply_rules(df, list(cfg.rules))

    # Stage 5 — scrub (codegen regex chain; byte-deterministic).
    df = df.withColumn("scrubbed_text", scrub_column("text_extracted"))
    return df


def results(validated: DataFrame) -> DataFrame:
    """The stable result projection (FIXTURES.md expected-output shape)."""
    return validated.select(
        "url",
        "warc_ts",
        "lang",
        "lang_pred",
        "lang_conf",
        "perplexity",
        "keep",
        "scrubbed_text",
        "violations",
        "violated_rules",
    )


def kept_documents(validated: DataFrame) -> DataFrame:
    return validated.filter(F.col("keep")).select("url", "warc_ts", "scrubbed_text")

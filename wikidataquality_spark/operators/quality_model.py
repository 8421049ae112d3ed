"""Model-based quality scoring: a trained linear (logistic) classifier over
the pure-SQL document statistics, evaluated entirely as Catalyst Column
expressions — zero Python in the row path.

This is the FineWeb/CCNet "model-based quality filter" family member the
heuristic rules can't cover: instead of K independent hard thresholds
(rules/library.py range rules — the reference's RangeChecker recast), one
trained monotone score summarizes the whole feature vector, so borderline
documents get graded rather than cliff-edged, and downstream mixture
construction can sort/stratify by quality (operators/sampling.py composes).
Trained by distillation: the target label is the frozen rule DAG's keep/drop
decision on the golden fixture corpus (tools/train_quality.py — the same
"distill an expensive annotator into a cheap scorer" shape FineWeb-Edu uses
with LLM annotations; our annotator is the full validation pipeline).

Scale/parity design, in the house style of semdedup.py:

  - The artifact (models/quality_lr_v1.json) is train-once and versioned;
    weights/means/scales are inlined as literals into BOTH the Spark plan
    and the DuckDB twin. Every FEATURE value replays bit-for-bit; the
    final weighted fold is ±1 ulp across engines (DuckDB fuses the
    multiply-adds — FMA rounds once where separate *,+ round twice), so
    the oracle gates the logit at the house ROUND(·, 6) and pytest pins
    a 1e-12 absolute tolerance on the raw value.
  - Every feature is +,-,*,/ over existing stat spellings — NO ln/exp in
    the gated path. Document-length saturation uses x/(x+c) (monotone,
    bounded, IEEE-exact in both engines) instead of log1p, because libm
    transcendentals are NOT bit-identical across engines. The exact-gated
    output is `quality_logit`; the sigmoid `quality_score` is provided for
    users and tested with tolerance only.
  - NULL features (empty/NULL text ⇒ NULL ratios) impute to the feature's
    training mean, i.e. 0 after standardization — the neutral vote.
  - The whole scorer is one codegen'd projection: no shuffle, no UDF, no
    join. At 100 TB it is a free rider on whatever scan already runs.

ref≈ the reference's constraint-*aggregation* ethos (DelegatingConstraintChecker
collecting per-rule CheckResults into one verdict,
ref≈includes/ConstraintCheck/DelegatingConstraintChecker.php:~40-200) recast
as a learned weighted vote instead of an all-must-pass conjunction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.operators.heuristics import (
    alpha_ratio,
    distinct_line_ratio,
    distinct_word_ratio,
    dup_line_char_ratio,
    mean_word_len,
    stopword_ratio,
    symbol_ratio,
    words_col,
)

QUALITY_LR_V1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models",
    "quality_lr_v1.json",
)

# Saturation constants for the two count features: x/(x+c) maps [0,∞) onto
# [0,1) with half-point at c. Frozen with the artifact version — changing
# them invalidates trained weights.
CHARS_SAT = 1000.0
WORDS_SAT = 200.0

# Ordered feature names; the artifact stores mu/sd/w in THIS order. The
# order is part of the v1 contract (tools/train_quality.py asserts it).
QUALITY_FEATURES = (
    "chars_sat",
    "words_sat",
    "mean_word_len",
    "stopword_ratio",
    "symbol_ratio",
    "distinct_word_ratio",
    "distinct_line_ratio",
    "dup_line_char_ratio",
    "alpha_ratio",
)


def feature_cols(text: Column) -> dict[str, Column]:
    """The nine quality features as Columns (shared stat spellings from
    operators/heuristics.py — one definition, oracle drift impossible)."""
    words = words_col(text)
    nc = F.length(text).cast("double")
    nw = F.size(words).cast("double")
    return {
        "chars_sat": nc / (nc + F.lit(CHARS_SAT)),
        "words_sat": nw / (nw + F.lit(WORDS_SAT)),
        "mean_word_len": mean_word_len(words),
        "stopword_ratio": stopword_ratio(words),
        "symbol_ratio": symbol_ratio(text),
        "distinct_word_ratio": distinct_word_ratio(words),
        "distinct_line_ratio": distinct_line_ratio(text),
        "dup_line_char_ratio": dup_line_char_ratio(text),
        "alpha_ratio": alpha_ratio(text),
    }


# DuckDB spellings of the same nine features. `w` below is the split-words
# list expression; these mirror heuristics.py exactly (the word split is the
# _DOC_STATS_CTE spelling already hash-proven by qf_doc_stats; the line
# split is the boilerplate_repetition_docs spelling).
_W_SQL = r"string_split_regex(trim({t}), '[\t\n\x0B\f\r ]+')"
_LINES_SQL = "string_split({t}, chr(10))"


def feature_sql(text_expr: str, stopword_sql: str) -> dict[str, str]:
    """DuckDB SQL fragment per feature over `text_expr`; `stopword_sql` is
    the quoted stop-word list (callers pass the frozen heuristics.STOPWORDS
    rendering so both engines consult the same list)."""
    w = _W_SQL.format(t=text_expr)
    lines = _LINES_SQL.format(t=text_expr)
    nc = f"CAST(length({text_expr}) AS DOUBLE)"
    nw = f"CAST(len({w}) AS DOUBLE)"
    line_chars = f"list_aggregate(list_transform({lines}, x -> length(x)), 'sum')"
    dist_line_chars = (
        f"list_aggregate(list_transform(list_distinct({lines}), x -> length(x)), 'sum')"
    )
    return {
        "chars_sat": f"({nc} / ({nc} + {CHARS_SAT!r}))",
        "words_sat": f"({nw} / ({nw} + {WORDS_SAT!r}))",
        "mean_word_len": (
            f"(list_aggregate(list_transform({w}, x -> length(x)), 'sum')"
            f" / nullif({nw}, 0.0))"
        ),
        "stopword_ratio": (
            f"(len(list_filter({w}, x -> x IN ({stopword_sql}))) / nullif({nw}, 0.0))"
        ),
        "symbol_ratio": (
            f"(length(regexp_replace({text_expr}, '[\\p{{L}}\\p{{N}}\\s]', '', 'g'))"
            f" / nullif({nc}, 0.0))"
        ),
        "distinct_word_ratio": f"(len(list_distinct({w})) / nullif({nw}, 0.0))",
        "distinct_line_ratio": (
            f"(len(list_distinct({lines})) / nullif(CAST(len({lines}) AS DOUBLE), 0.0))"
        ),
        "dup_line_char_ratio": (
            f"(({line_chars} - {dist_line_chars})"
            f" / nullif(CAST({line_chars} AS DOUBLE), 0.0))"
        ),
        "alpha_ratio": (
            f"(length(regexp_replace({text_expr}, '[^A-Za-z]', '', 'g'))"
            f" / nullif({nc}, 0.0))"
        ),
    }


def load_quality_model(path: str = QUALITY_LR_V1) -> dict:
    """Load the versioned train-once artifact. JSON doubles round-trip at
    repr precision, so Spark F.lit literals and the oracle's literals decode
    to identical IEEE values (same guarantee as the semdedup centroids)."""
    with open(path) as f:
        art = json.load(f)
    if tuple(art["features"]) != QUALITY_FEATURES:
        raise ValueError(
            "quality artifact feature order does not match QUALITY_FEATURES — "
            "retrain with tools/train_quality.py, never hand-edit"
        )
    return art


def quality_logit_col(text: Column, art: dict) -> Column:
    """The linear score b + Σ w_i·(x_i − mu_i)/sd_i as ONE Column expression.

    Addition order is the fixed artifact feature order on both engines, so
    the float sum is bit-identical (same reason dot_sql fixes element order).
    """
    feats = feature_cols(text)
    acc: Column = F.lit(float(art["bias"]))
    for name, mu, sd, w in zip(
        QUALITY_FEATURES, art["mu"], art["sd"], art["w"], strict=True
    ):
        x = F.coalesce(feats[name].cast("double"), F.lit(float(mu)))
        acc = acc + F.lit(float(w)) * ((x - F.lit(float(mu))) / F.lit(float(sd)))
    return acc


def quality_logit_sql(text_expr: str, stopword_sql: str, art: dict) -> str:
    """DuckDB twin of quality_logit_col — identical literals, identical
    association order (left fold over features)."""
    feats = feature_sql(text_expr, stopword_sql)
    acc = repr(float(art["bias"]))
    for name, mu, sd, w in zip(
        QUALITY_FEATURES, art["mu"], art["sd"], art["w"], strict=True
    ):
        x = f"coalesce({feats[name]}, {float(mu)!r})"
        acc = f"({acc} + {float(w)!r} * (({x} - {float(mu)!r}) / {float(sd)!r}))"
    return acc


def with_quality_score(
    df: DataFrame, text_col: str = "text", art: dict | None = None
) -> DataFrame:
    """Append `quality_logit` (exact-gated), `quality_score` (sigmoid, user
    convenience — transcendental, tolerance-tested only) and `quality_class`
    (low/medium/high via the artifact's logit thresholds — exact comparisons
    on the exact logit, so the class is oracle-gateable too)."""
    art = art or load_quality_model()
    logit = quality_logit_col(F.col(text_col), art)
    lo, hi = (float(t) for t in art["class_logits"])
    out = df.withColumn("quality_logit", logit)
    return out.withColumn(
        "quality_score",
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("quality_logit"))),
    ).withColumn(
        "quality_class",
        F.when(F.col("quality_logit") < lo, F.lit("low"))
        .when(F.col("quality_logit") < hi, F.lit("medium"))
        .otherwise(F.lit("high")),
    )


def quality_class_sql(logit_expr: str, art: dict) -> str:
    lo, hi = (float(t) for t in art["class_logits"])
    return (
        f"CASE WHEN {logit_expr} < {lo!r} THEN 'low' "
        f"WHEN {logit_expr} < {hi!r} THEN 'medium' ELSE 'high' END"
    )

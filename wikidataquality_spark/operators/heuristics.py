"""Gopher/C4-style document statistics as pure Catalyst Column expressions.

Parity: the reference's RangeChecker + helper compute a scalar per statement
and test it against [min,max] (ref≈includes/ConstraintCheck/Checker/
RangeChecker.php:~30-140, Helper/RangeCheckerHelper.php:~20-120). Our scalars
are document statistics (mean word length, stop-word ratio, symbol ratio,
repeated-content ratios) in the spirit of Gopher (Rae et al. 2021) and C4
(Raffel et al. 2020). Everything here is a Column expression — zero Python
in the row path, fully whole-stage-codegen'd, and (deliberately) expressible
in ANSI SQL so the DuckDB oracle can verify each stat bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small, fixed English stop-word list. Frozen: changing it changes golden
# labels (BASELINE.md byte-identical/F1 targets), so treat as versioned data.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def words_col(text: Column) -> Column:
    """Whitespace tokenization; trims so no empty leading/trailing tokens."""
    return F.split(F.trim(text), r"\s+")


def n_words(words: Column) -> Column:
    return F.size(words)


def mean_word_len(words: Column) -> Column:
    """Sum of token lengths / token count (NULL for empty docs)."""
    total = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total / F.nullif(F.size(words).cast("double"), F.lit(0.0))


def stopword_ratio(words: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return hits / F.nullif(F.size(words).cast("double"), F.lit(0.0))


# Per-language stop-word lists for the multilingual variant below. Frozen
# like STOPWORDS (versioned data, additive — the original English-only stat
# keeps feeding the golden-pinned rules unchanged). zh entries are function
# CHARACTERS, not whitespace tokens: Chinese has no space boundaries, so the
# zh arm measures a character fraction (see stopword_ratio_for).
STOPWORDS_BY_LANG = {
    "en": STOPWORDS,
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "en"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "不", "人", "这"),
}


def stopword_ratio_for(text: Column, lang: Column) -> Column:
    """Language-aware stop-word ratio — the Gopher signal done right for a
    multilingual corpus (the frozen `stopword_ratio` stat is English-only
    by golden contract; this one dispatches on the DETECTED language).
    Alphabetic languages: stop TOKENS / tokens (lower-cased). zh: function
    CHARACTERS / characters (no whitespace word boundaries). Unknown or
    NULL language → NULL: a ratio against the wrong list reads as a quality
    judgment and silently penalizes every language outside the table —
    NULL routes the doc to the rule layer's `exception` arm instead."""
    words = words_col(F.lower(text))
    expr: Column = F.lit(None).cast("double")
    for code, sw in STOPWORDS_BY_LANG.items():
        if code == "zh":
            chars = F.split(text, "")
            arm = F.size(F.filter(chars, lambda c: c.isin(*sw))) / F.nullif(
                F.length(text).cast("double"), F.lit(0.0)
            )
        else:
            arm = stopword_ratio(words, sw)
        expr = F.when(lang == code, arm).otherwise(expr)
    return expr


def symbol_ratio(text: Column) -> Column:
    """Fraction of characters that are not letters (any script), digits, or
    whitespace. Unicode classes so CJK text isn't counted as symbols; \\p{L}
    has identical semantics in Java regex and DuckDB's RE2 (oracle parity)."""
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped) / F.nullif(F.length(text).cast("double"), F.lit(0.0))


def distinct_word_ratio(words: Column) -> Column:
    """Repetition proxy: |distinct tokens| / |tokens| (SingleValueChecker recast,
    ref≈Checker/SingleValueChecker.php:~30-80 → within-doc duplicate content)."""
    return F.size(F.array_distinct(words)) / F.nullif(
        F.size(words).cast("double"), F.lit(0.0)
    )


def distinct_line_ratio(text: Column) -> Column:
    """|distinct lines| / |lines|; 1.0 for single-line docs."""
    lines = F.split(text, r"\n")
    return F.size(F.array_distinct(lines)) / F.nullif(
        F.size(lines).cast("double"), F.lit(0.0)
    )


def dup_line_char_ratio(text: Column) -> Column:
    """Gopher's "fraction of characters in duplicate lines": for each group
    of identical lines with count c and length L, the (c−1)·L repeated
    characters count as duplicated — equivalently, (total line chars −
    distinct-line chars) / total line chars. Catches the character-weighted
    boilerplate the line-COUNT ratio underweights (one 500-char footer
    repeated 3× moves this ratio far more than 2/40 lines). 0.0 for docs with
    no repetition; NULL for docs whose lines hold zero characters."""
    lines = F.split(text, r"\n")

    def char_sum(arr: Column) -> Column:
        return F.aggregate(
            F.transform(arr, lambda ln: F.length(ln)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    total = char_sum(lines)
    return (total - char_sum(F.array_distinct(lines))) / F.nullif(
        total.cast("double"), F.lit(0.0)
    )


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    letters = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return letters / F.nullif(F.length(text).cast("double"), F.lit(0.0))


STAT_BUILDERS = {
    "n_chars_stat": lambda text, words: F.length(text).cast("long"),
    "n_words_stat": lambda text, words: F.size(words).cast("long"),
    "mean_word_len_stat": lambda text, words: mean_word_len(words),
    "stopword_ratio_stat": lambda text, words: stopword_ratio(words),
    "symbol_ratio_stat": lambda text, words: symbol_ratio(text),
    "distinct_word_ratio_stat": lambda text, words: distinct_word_ratio(words),
    "distinct_line_ratio_stat": lambda text, words: distinct_line_ratio(text),
    "dup_line_char_ratio_stat": lambda text, words: dup_line_char_ratio(text),
    "alpha_ratio_stat": lambda text, words: alpha_ratio(text),
}


def with_doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append every document statistic as a column named after its stat key.

    One select — Catalyst computes the shared `words` subexpression once via
    common-subexpression elimination inside whole-stage codegen.
    """
    text = F.col(text_col)
    words = words_col(text)
    cols = [df[c] for c in df.columns]
    cols += [fn(text, words).alias(name) for name, fn in STAT_BUILDERS.items()]
    return df.select(*cols)

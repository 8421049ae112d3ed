"""Corpus-wide boilerplate line removal (C4/RefinedWeb-style).

The within-doc repetition signal (heuristics.distinct_line_ratio) cannot see
nav menus, cookie banners, and footers that appear once per page across
thousands of pages — the dominant noise class in crawled web text. This
operator removes lines that occur in ≥ min_doc_freq DISTINCT documents
corpus-wide, preserving everything else byte-identically (split('\n') +
array_join('\n') is an exact identity when nothing is removed).

Parity note: this recasts the same ethos as the reference's corpus-level
UniqueValueChecker (ref≈includes/ConstraintCheck/Checker/UniqueValueChecker.php:
~30-90) one level below the document: the "value" is a line, the "violation"
is corpus-wide repetition, and the remedy is scrub-not-drop.

Scale shape (10^12 docs): one posexplode of line rows, one hash aggregation
for distinct-doc frequencies (8-byte xxhash64 keys — no line string is ever
shuffled for counting), one equi-join of eligible line rows against the
frequent-key table, one doc-id aggregation to reassemble text. No Python, no
window over the corpus, no driver-side state. Frequency counting uses EXACT
count_distinct (a (key, doc) partial-dedup inside the agg); a deployment that
tolerates ±2% on the threshold swaps in approx_count_distinct to drop the
expansion — noted here so the tradeoff is explicit, not accidental.

Hash-key caveat (same bound as textstats' gram ids): two distinct lines
colliding in xxhash64 merge their doc counts, which can only OVER-mark a line
as boilerplate; P ≈ |distinct lines|² / 2⁶⁵ — at 10¹⁰ distinct lines that is
~3·10⁻², i.e. at most a handful of spurious line removals corpus-wide, and
zero at test scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lines shorter than this (after trim) are exempt from counting AND removal:
# "Home", "OK", dates — short strings repeat across unrelated pages for
# benign reasons, and removing them shreds list-like content. RefinedWeb
# applies the same floor to its line-dedup pass.
DEFAULT_MIN_CHARS = 10
# A line must appear in at least this many DISTINCT documents to be
# boilerplate. Distinct-doc, not total occurrences: a line repeated 50×
# inside ONE page is within-doc repetition (heuristics' job), not template
# boilerplate.
DEFAULT_MIN_DOC_FREQ = 3


def _line_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _pos, _line) — one row per line, positions 0-based. split with
    limit -1 keeps trailing empty strings, so reassembly is byte-exact.
    NULL-text docs vanish here (posexplode of NULL) and are re-attached by
    the caller's final left join."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("_pos", "_line"),
    )


def _eligible(line: Column, min_chars: int) -> Column:
    return F.length(F.trim(line)) >= min_chars


def boilerplate_line_keys(
    docs: DataFrame,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    min_chars: int = DEFAULT_MIN_CHARS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(_lk, doc_freq) — xxhash64 keys of trimmed lines appearing in
    ≥ min_doc_freq distinct documents. Trim-keyed so indentation variants of
    one template line count together (removal keeps the original bytes of
    NON-matching lines regardless)."""
    lines = _line_rows(docs, id_col, text_col)
    return (
        lines.filter(_eligible(F.col("_line"), min_chars))
        .select(F.col(id_col), F.xxhash64(F.trim("_line")).alias("_lk"))
        .groupBy("_lk")
        .agg(F.count_distinct(F.col(id_col)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    min_chars: int = DEFAULT_MIN_CHARS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text_cleaned, n_lines_removed, n_lines_total) — text with
    corpus-frequent lines removed, all other lines byte-identical and in
    original order. Scrub-not-drop: every input document stays a row
    (NULL text → NULL text_cleaned; all lines removed → '').

    PRECONDITION: id_col is unique per document (the corpus contract every
    id-keyed operator here shares — dedup survivors, decontamination flags).
    Rows sharing a non-NULL id would have their LINES MERGED by the per-doc
    reassembly (interleaved by position) and the merged text re-attached to
    every duplicate row — run exact/URL dedup first if ids can repeat.

    NULL-id documents pass through BYTE-IDENTICAL with zero removals: they
    cannot be grouped per-document for reassembly (a NULL join key matches
    nothing, and several NULL-id docs would merge into one line group), and
    a scrubber must never destroy text it cannot attribute. Their lines also
    carry zero weight in the frequency count (count_distinct skips NULL ids)
    — consistent on both sides of the ledger (r04 review).
    """
    nn = F.col(id_col).isNotNull()
    frequent = boilerplate_line_keys(
        docs, min_doc_freq=min_doc_freq, min_chars=min_chars,
        id_col=id_col, text_col=text_col,
    ).select("_lk")

    lines = _line_rows(docs.filter(nn), id_col, text_col).withColumn(
        "_lk",
        # key only eligible lines — ineligible ones never match the join and
        # carry a NULL key, which keeps the join's left side narrow
        F.when(_eligible(F.col("_line"), min_chars), F.xxhash64(F.trim("_line"))),
    )
    marked = lines.join(
        frequent.withColumn("_hit", F.lit(True)), "_lk", "left"
    ).withColumn("_keep", F.col("_hit").isNull())

    # collect_list drops NULLs, so when(_keep, struct) collects exactly the
    # surviving lines; sort_array orders by _pos (first struct field, unique
    # per doc). Docs whose every line is removed still aggregate to a row
    # (empty array → '').
    recon = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("_pos", "_line"))
                    )
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text_cleaned"),
        F.count(F.when(~F.col("_keep"), 1)).alias("n_lines_removed"),
        F.count("*").alias("n_lines_total"),
    )

    # left join re-attaches NULL-text docs (they produced no line rows):
    # NULL text stays NULL, with zero counts — never coerced to ''.
    processed = (
        docs.filter(nn)
        .select(id_col)
        .join(recon, id_col, "left")
        .select(
            id_col,
            "text_cleaned",
            F.coalesce("n_lines_removed", F.lit(0).cast("long")).alias(
                "n_lines_removed"
            ),
            F.coalesce("n_lines_total", F.lit(0).cast("long")).alias(
                "n_lines_total"
            ),
        )
    )
    passthrough = docs.filter(~nn).select(
        F.col(id_col),
        F.col(text_col).alias("text_cleaned"),
        F.lit(0).cast("long").alias("n_lines_removed"),
        F.coalesce(
            F.size(F.split(F.col(text_col), "\n", -1)).cast("long"), F.lit(0)
        ).alias("n_lines_total"),
    )
    return processed.unionByName(passthrough)


def remove_boilerplate_lines_sql(
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> str:
    """DuckDB twin over a `documents(doc_id, text)` view — same semantics,
    keyed on the trimmed line STRING instead of its xxhash64 (DuckDB has no
    xxhash64; absent 64-bit collisions the outputs are identical, and a
    collision only over-removes on the Spark side — see module docstring).
    string_agg(... ORDER BY pos) FILTER reassembles survivors; chr(10) is the
    literal '\\n' so the twin never fights SQL-string escaping."""
    return f"""
WITH e AS (
  -- (x, i) lambda carries the 1-based position through the unnest; a plain
  -- LATERAL generate_series over len(ls) is not supported by DuckDB's binder
  SELECT doc_id,
         unnest(list_transform(string_split(text, chr(10)),
                               (x, i) -> {{'pos': i, 'line': x}})) AS u
  FROM documents
),
l AS (
  SELECT doc_id, u.pos AS pos, u.line AS line FROM e
),
freq AS (
  SELECT trim(line) AS lk
  FROM l
  WHERE length(trim(line)) >= {min_chars}
  GROUP BY lk
  HAVING count(DISTINCT doc_id) >= {min_doc_freq}
),
marked AS (
  SELECT doc_id, pos, line,
         NOT (length(trim(line)) >= {min_chars} AND trim(line) IN (SELECT lk FROM freq)) AS keep
  FROM l
),
recon AS (
  SELECT doc_id,
         COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE keep), '') AS text_cleaned,
         COUNT(*) FILTER (WHERE NOT keep) AS n_lines_removed,
         COUNT(*) AS n_lines_total
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.doc_id IS NULL THEN d.text ELSE r.text_cleaned END
         AS text_cleaned,
       CASE WHEN d.doc_id IS NULL THEN 0
            ELSE COALESCE(r.n_lines_removed, 0) END AS n_lines_removed,
       CASE WHEN d.doc_id IS NULL
            THEN COALESCE(len(string_split(d.text, chr(10))), 0)
            ELSE COALESCE(r.n_lines_total, 0) END AS n_lines_total
FROM (SELECT doc_id, text FROM documents) d
LEFT JOIN recon r ON r.doc_id = d.doc_id
"""

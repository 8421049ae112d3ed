"""Report surface: the batch analogue of the reference's special pages.

Parity: the reference renders three interactive HTML report UIs —
SpecialConstraintReport (ref≈specials/SpecialConstraintReport.php:~40-250:
entity-id form → run checks → per-statement result table),
SpecialCrossCheck (ref≈specials/SpecialCrossCheck.php:~40-250: per-entity
comparison table against external databases), and SpecialExternalDbs
(ref≈specials/SpecialExternalDbs.php:~40-200: the list of imported dumps).
There is no web UI in a Spark engine, so each page becomes a DataFrame
builder (the "run checks → table" step) plus a deterministic markdown
renderer (the "render" step); the interactive entity-id form becomes a
predicate-pushdown point lookup over the validated table.

Scale shape: the report builders are pure projections/explodes over already
-validated tables — no new shuffle; the point-lookup filter pushes to the
scan (an id-partitioned or Iceberg-bucketed table makes it a partition-
pruned read); render_markdown caps rows BEFORE collect so the driver never
materializes an unbounded report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_report(validated: DataFrame, id_col: str = "url") -> DataFrame:
    """Per-document check-result rows — SpecialConstraintReport's result
    table (one row per (document, rule) with status/score/detail), built by
    exploding the violations array apply_rules attached."""
    return validated.select(id_col, F.explode("violations").alias("_v")).select(
        id_col,
        F.col("_v.rule").alias("rule"),
        F.col("_v.status").alias("status"),
        F.col("_v.score").alias("score"),
        F.col("_v.detail").alias("detail"),
    )


def constraint_report_for(
    validated: DataFrame, doc_ids: list, id_col: str = "url"
) -> DataFrame:
    """The entity-id form: report rows for specific documents only. The isin
    filter sits above the scan, so Catalyst pushes it into the source read
    (partition-pruned on an id-bucketed table)."""
    return constraint_report(
        validated.filter(F.col(id_col).isin(doc_ids)), id_col
    )


def crosscheck_report(checked: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document comparison rows — SpecialCrossCheck's table. Input is
    operators/crosscheck.crosscheck output (one `comparisons` array of
    per-field ComparisonResult structs per row; a dump_id row column rides
    along when with_dump_meta attached it)."""
    extra = ["dump_id"] if "dump_id" in checked.columns else []
    return checked.select(
        id_col, *extra, F.explode("comparisons").alias("_c")
    ).select(
        id_col,
        F.col("_c.field").alias("field"),
        F.col("_c.status").alias("status"),
        F.col("_c.checked_value").alias("checked_value"),
        F.col("_c.external_value").alias("external_value"),
        *extra,
    )


def external_dbs_report(meta: DataFrame) -> DataFrame:
    """The imported-dumps listing — SpecialExternalDbs. Input is the
    DumpMetaInformation dimension (operators/crosscheck.dump_meta_table)."""
    return meta.orderBy("dump_id")


def render_markdown(report: DataFrame, max_rows: int = 200, title: str | None = None) -> str:
    """Deterministic markdown table of a report DataFrame — the 'render'
    step of the special pages. Caps at max_rows BEFORE collect (ordered by
    every column for a stable render) and notes the truncation, so a report
    over a 10^12-doc table can never flood the driver."""
    cols = report.columns
    rows = report.orderBy(*cols).limit(max_rows + 1).collect()
    truncated = len(rows) > max_rows
    rows = rows[:max_rows]
    lines = []
    if title:
        lines.append(f"# {title}")
        lines.append("")
    def cell(v) -> str:
        # cell values come from arbitrary documents (rule details carry
        # array_join/host strings): a literal '|' or newline would break the
        # table's row structure and silently misalign columns (r03 ADVICE).
        # Backslashes are escaped FIRST — a value already containing '\|'
        # would otherwise render as '\\|', which markdown reads as an
        # escaped backslash followed by a LIVE pipe delimiter
        return (
            ""
            if v is None
            else str(v)
            .replace("\\", "\\\\")
            .replace("|", "\\|")
            .replace("\r", " ")
            .replace("\n", " ")
        )

    lines.append("| " + " | ".join(cell(c) for c in cols) + " |")
    lines.append("| " + " | ".join("---" for _ in cols) + " |")
    for r in rows:
        lines.append("| " + " | ".join(cell(r[c]) for c in cols) + " |")
    if truncated:
        lines.append("")
        lines.append(f"_… truncated at {max_rows} rows_")
    return "\n".join(lines) + "\n"

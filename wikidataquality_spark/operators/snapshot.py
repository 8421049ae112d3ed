"""Cross-snapshot diffing — what changed between two crawls of a corpus.

Parity: the reference re-checks entities incrementally when they change
(ref≈includes/EvaluateConstraintReportJob.php:~15-80 — an edit enqueues a
re-evaluation of just that entity); the lake analogue needs the change SET
first: given last month's snapshot and this month's crawl, which urls are
new, gone, changed, or byte-identical. That set is what drives incremental
validation (`dup_marks(state=…)` / `incremental_validate` consume exactly
the added+changed slice), recrawl policies, and freshness metrics.

Scale design: documents never shuffle. Each side collapses to
(id, 16-byte double hash) in a codegen projection at the scan, and the
diff is ONE full-outer equi-join of those narrow rows — at 10^12 docs the
join moves ~24 B/row, not the corpus. The double 64-bit hash is the house
false-merge bound (~2⁻¹²⁸/pair, operators/dedup.py); a hash "unchanged"
verdict is wrong only on a 128-bit collision. Precondition: each snapshot
is id-unique (the B:15 per-url contract; url_dup_marks is the upstream
stage that makes a raw crawl so) — duplicate ids would cross-join inside
the equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def _hashed(df: DataFrame, id_col: str, text_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.xxhash64(text_col).alias(f"{prefix}1"),
        F.xxhash64(F.lit(1), F.col(text_col)).alias(f"{prefix}2"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(id, status ∈ {added, removed, changed, unchanged}) for every id in
    either snapshot. NULL text is a value: NULL → NULL is unchanged
    (null-safe hash comparison), NULL → text is changed — xxhash64(NULL) is
    NULL, so plain equality would misread every NULL-text pair as changed.
    NULL ids never join (SQL equi-join semantics), so each NULL-id row
    surfaces individually: 'removed' from old, 'added' from new —
    changed_slice carries the same rows, keeping report and slice equal."""
    o = _hashed(old, id_col, text_col, "_o")
    n = _hashed(new, id_col, text_col, "_n")
    # presence flags, not hash nullness, mark which side a row came from:
    # xxhash64(NULL) is NULL, so a present row with NULL text is
    # indistinguishable from the absent side by its hash columns alone
    return (
        o.withColumn("_in_old", F.lit(True))
        .join(n.withColumn("_in_new", F.lit(True)), id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("_in_old").isNull(), F.lit(STATUS_ADDED))
            .when(F.col("_in_new").isNull(), F.lit(STATUS_REMOVED))
            .when(
                F.col("_o1").eqNullSafe(F.col("_n1"))
                & F.col("_o2").eqNullSafe(F.col("_n2")),
                F.lit(STATUS_UNCHANGED),
            )
            .otherwise(F.lit(STATUS_CHANGED))
            .alias("status"),
        )
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """status → count (one partial-agg shuffle of 4 groups)."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))


def changed_slice(new: DataFrame, diff: DataFrame, id_col: str = "url") -> DataFrame:
    """The added+changed rows of the new snapshot — the exact input
    incremental validation re-processes (a broadcast-friendly semi-join
    when the change set is small, the common recrawl case).

    NULL-id rows: the diff's full-outer join never matches NULL keys, so
    every NULL-id row of the new snapshot is status 'added' — and a plain
    semi-join would silently DROP those very rows here (NULL never
    semi-matches), making the slice disagree with the diff report. They are
    unioned back explicitly so diff and slice stay consistent."""
    ids = diff.filter(F.col("status").isin(STATUS_ADDED, STATUS_CHANGED)).select(id_col)
    matched = new.filter(F.col(id_col).isNotNull()).join(ids, id_col, "left_semi")
    return matched.unionByName(new.filter(F.col(id_col).isNull()))


def snapshot_diff_sql(id_col: str = "url", text_col: str = "text") -> str:
    """DuckDB twin over `snap_old` / `snap_new` views — same semantics keyed
    on the text STRING itself (DuckDB has no xxhash64; absent 128-bit
    collisions the outputs are identical, and a collision only turns one
    'changed' into 'unchanged' on the Spark side)."""
    return f"""
SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col},
       CASE WHEN o.{id_col} IS NULL THEN 'added'
            WHEN n.{id_col} IS NULL THEN 'removed'
            WHEN o.{text_col} IS NOT DISTINCT FROM n.{text_col} THEN 'unchanged'
            ELSE 'changed' END AS status
FROM snap_old o FULL OUTER JOIN snap_new n ON o.{id_col} = n.{id_col}
"""

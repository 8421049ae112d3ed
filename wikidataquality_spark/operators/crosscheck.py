"""CrossCheck: compare checked data against an external reference dump.

Parity: the reference's second pillar — CrossCheck compares each claimed
value against the corresponding value in an external database dump and
classifies the pair via per-data-type comparers
(ref≈includes/CrossCheck/CrossChecker.php:~30-120,
ref≈includes/CrossCheck/Comparer/*.php:~20-90 — StringValueComparer,
QuantityValueComparer, TimeValueComparer, MultilingualTextValueComparer,
EntityIdValueComparer, MonolingualTextValueComparer), producing
CrossCheckResult records (ref≈includes/CrossCheck/Result/
CrossCheckResult.php) tagged with the dump's metadata
(ref≈includes/DumpMetaInformation/DumpMetaInformation.php:~20-80).

Spark-first recast: each comparer is a pure Column expression returning a
ComparisonResult struct {field, status, checked_value, external_value};
statuses are the reference's trio match / partial-match / mismatch
(ref≈ComparisonResult::STATUS_MATCH / STATUS_PARTIAL_MATCH /
STATUS_MISMATCH). The external dump is a normal DataFrame joined on the
entity key — broadcast when it is dimension-sized — and the dump-metadata
table is a tiny broadcast dim exactly like the reference's
DumpMetaInformation lookup.

All comparers are null-total: both sides NULL → match (nothing claimed,
nothing expected); exactly one side NULL → mismatch. No UDFs anywhere —
the whole comparison stage is whole-stage-codegen'd JVM expressions, so
cross-checking 10^12 rows costs one broadcast join plus codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MATCH = "match"
PARTIAL = "partial"
MISMATCH = "mismatch"

COMPARISON_RESULT_TYPE = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("checked_value", T.StringType(), True),
        T.StructField("external_value", T.StringType(), True),
    ]
)


def _null_totalize(a: Column, b: Column, core: Column) -> Column:
    """Wrap a comparer's non-null logic with the shared null semantics."""
    return (
        F.when(a.isNull() & b.isNull(), F.lit(MATCH))
        .when(a.isNull() | b.isNull(), F.lit(MISMATCH))
        .otherwise(core)
    )


def compare_string(a: Column, b: Column, partial_distance: int = 2) -> Column:
    """StringValueComparer: exact → match; small edit distance OR one value
    containing the other (the reference's partial-text rule) → partial."""
    # containment needs a NONEMPTY contained value: contains('') is always
    # true, so an empty string vs any value would read PARTIAL instead of
    # MISMATCH — every blank/scrubbed field would systematically understate
    # mismatch counts (r04 review). a == b already owns the both-empty case.
    core = (
        F.when(a == b, F.lit(MATCH))
        .when(
            (F.levenshtein(a, b) <= partial_distance)
            | (a.contains(b) & (F.length(b) > 0))
            | (b.contains(a) & (F.length(a) > 0)),
            F.lit(PARTIAL),
        )
        .otherwise(F.lit(MISMATCH))
    )
    return _null_totalize(a, b, core)


def compare_quantity(a: Column, b: Column, abs_tol: float = 0.0) -> Column:
    """QuantityValueComparer: exact → match; within the tolerance interval
    (the reference compares against the quantity's upper/lower bounds) →
    partial. try_cast, not cast: external dumps deliver quantities as
    strings, and under Spark 4's default ANSI mode a single '12 kg' in
    10^12 rows would otherwise raise CAST_INVALID_INPUT and abort the whole
    job — a quality filter must judge malformed values (NULL cast ⇒ every
    when() is NULL ⇒ MISMATCH), not die on them."""
    ad, bd = a.try_cast("double"), b.try_cast("double")
    core = (
        F.when(ad == bd, F.lit(MATCH))
        .when(F.abs(ad - bd) <= F.lit(abs_tol), F.lit(PARTIAL))
        .otherwise(F.lit(MISMATCH))
    )
    return _null_totalize(a, b, core)


def compare_timestamp(a: Column, b: Column, tol_seconds: int = 0) -> Column:
    """TimeValueComparer: same instant → match; within tol_seconds (the
    reference's calendar-precision slack) → partial. Integer epoch math so
    the comparison is exact on any engine. try_cast for the same ANSI-mode
    totality reason as compare_quantity: '2024-13-45' classifies as
    MISMATCH instead of aborting the job."""
    au = F.unix_micros(a.try_cast("timestamp"))
    bu = F.unix_micros(b.try_cast("timestamp"))
    core = (
        F.when(au == bu, F.lit(MATCH))
        .when(F.abs(au - bu) <= F.lit(tol_seconds * 1_000_000), F.lit(PARTIAL))
        .otherwise(F.lit(MISMATCH))
    )
    return _null_totalize(a, b, core)


def compare_set(a: Column, b: Column) -> Column:
    """MultilingualText/EntityId set comparer: equal as sets → match; any
    overlap → partial; disjoint → mismatch."""
    core = (
        F.when(
            (F.size(F.array_except(a, b)) == 0) & (F.size(F.array_except(b, a)) == 0),
            F.lit(MATCH),
        )
        .when(F.size(F.array_intersect(a, b)) > 0, F.lit(PARTIAL))
        .otherwise(F.lit(MISMATCH))
    )
    return _null_totalize(a, b, core)


_COMPARERS = {
    "string": compare_string,
    "quantity": compare_quantity,
    "timestamp": compare_timestamp,
    "set": compare_set,
}


def comparison_result(field: str, status: Column, checked: Column, external: Column) -> Column:
    """One ComparisonResult struct (ref≈CrossCheck/Result/ComparisonResult.php)."""
    return F.struct(
        F.lit(field).alias("field"),
        status.alias("status"),
        checked.cast("string").alias("checked_value"),
        external.cast("string").alias("external_value"),
    )


def crosscheck(
    checked: DataFrame,
    external: DataFrame,
    on: str,
    fields: list[tuple[str, str, str, dict]],
    broadcast_external: bool = True,
) -> DataFrame:
    """Cross-check `checked` against the external dump `external`.

    fields: list of (checked_col, external_col, kind, kwargs) — kind selects
    the comparer ('string' | 'quantity' | 'timestamp' | 'set').

    Output: the checked rows (inner-joined to the dump on `on`) with a
    `comparisons` array<ComparisonResult> plus n_match / n_partial /
    n_mismatch counts — the CrossCheckResultList of the reference, flattened
    to one row per entity.

    Scale shape: ONE equi-join on the entity key (broadcast when the dump is
    dimension-sized, sort-merge otherwise) and pure codegen expressions;
    adding a comparer adds zero shuffles.
    """
    # loud collision guard (same discipline as graphcheck._RESERVED): a
    # non-key column shared by both sides makes F.col(name) ambiguous after
    # the join (AnalysisException deep in the comparer expressions) or, if
    # unused, silently duplicates the output column; 'comparisons'/'n_*'
    # are this operator's own outputs (r04 review)
    reserved = {"comparisons", "n_match", "n_partial", "n_mismatch"}
    shared = (set(checked.columns) & set(external.columns)) - {on}
    clash = sorted(shared | (set(checked.columns) & reserved) | (set(external.columns) & reserved))
    if clash:
        raise ValueError(
            f"crosscheck: column names {clash} are shared between checked and "
            f"external (or collide with the operator's outputs {sorted(reserved)}); "
            "rename them before cross-checking"
        )
    ext = F.broadcast(external) if broadcast_external else external
    j = checked.join(ext, on, "inner")
    results = []
    for checked_col, external_col, kind, kwargs in fields:
        cmp_fn = _COMPARERS[kind]
        status = cmp_fn(F.col(checked_col), F.col(external_col), **kwargs)
        results.append(
            comparison_result(checked_col, status, F.col(checked_col), F.col(external_col))
        )
    arr = F.array(*results)
    n_of = lambda s: F.size(F.filter(arr, lambda r: r["status"] == s)).cast("long")  # noqa: E731
    return j.withColumn("comparisons", arr).withColumn(
        "n_match", n_of(MATCH)
    ).withColumn("n_partial", n_of(PARTIAL)).withColumn("n_mismatch", n_of(MISMATCH))


# ---------------------------------------------------------------------------
# DumpMetaInformation: the external dump's metadata as a broadcast dim
# (ref≈includes/DumpMetaInformation/DumpMetaInformationLookup.php:~20-60).
# ---------------------------------------------------------------------------

DUMP_META_SCHEMA = T.StructType(
    [
        T.StructField("dump_id", T.StringType(), False),
        T.StructField("source_name", T.StringType(), False),
        T.StructField("language", T.StringType(), True),
        T.StructField("license", T.StringType(), True),
        T.StructField("import_date", T.StringType(), True),
    ]
)


def dump_meta_table(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Materialize the dump-metadata dim (a handful of rows, always broadcast)."""
    return spark.createDataFrame(rows, DUMP_META_SCHEMA)


def with_dump_meta(df: DataFrame, meta: DataFrame, on: str = "dump_id") -> DataFrame:
    """Attach dump metadata via an explicit broadcast join — the reference
    resolves DumpMetaInformation per external-data row; here it is one
    map-side hash join, no shuffle."""
    return df.join(F.broadcast(meta), on, "left")

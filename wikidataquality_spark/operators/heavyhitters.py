"""Distributed heavy hitters (Misra–Gries) — frequent keys with PROVEN
bounds and bounded memory, at any key cardinality.

Parity: the reference's violation statistics are full GROUP BY counts over
bounded key sets (constraint types — ref≈specials/SpecialConstraintReport.php
summaries); a webtext corpus's key spaces are unbounded (10⁹ distinct hosts,
arbitrarily many n-grams), where an exact groupBy shuffles one row per
DISTINCT key. The questions that matter at 100 TB — which hosts dominate
(skew/salting), which boilerplate n-grams flood the corpus — only need the
HEAVY keys, and Misra–Gries answers with k counters per partition and a
proof: after summarizing n rows with total undercount d (tracked exactly,
d ≤ n/(k+1)), every key with true frequency > d is GUARANTEED present, and
true_count ∈ [count_lb, count_lb + d] for every candidate.

Scale design: one mapInPandas pass emits ≤ k (key, count_lb) rows + 1 meta
row per partition — the shuffle is ≤ P·(k+1) rows TOTAL, independent of key
cardinality (the exact groupBy in repartition_by_host_salted shuffles
O(distinct hosts); this module is its documented production-scale
replacement). Batches are counted vectorized (value_counts) and folded with
the standard mergeable-summary MG merge (subtract the (k+1)-th largest,
keep positives); each merge's subtraction adds exactly its amount to d.
The whole result is ONE plan — summaries → per-key sums + a global window
over the ≤ P·(k+1)-row frame for the meta totals — so the input is scanned
exactly once and nothing is persisted.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

DEFAULT_K = 256

_MG_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),  # NULL is a real key
        T.StructField("count_lb", T.LongType(), False),
        T.StructField("is_meta", T.BooleanType(), False),
        T.StructField("n_rows", T.LongType(), False),  # meta rows only
        T.StructField("decrements", T.LongType(), False),  # meta rows only
    ]
)


def mg_merge(counters: dict, batch_counts: dict, k: int) -> tuple[dict, int]:
    """Fold exact batch counts into a k-counter MG summary. Returns the new
    summary (≤ k keys) and the amount subtracted from every key (this
    merge's addition to the total undercount d). Subtracting the (k+1)-th
    largest value and keeping positives is the Agarwal et al.
    mergeable-summary form; with ≤ k keys nothing is subtracted."""
    for key, c in batch_counts.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) <= k:
        return counters, 0
    dec = sorted(counters.values(), reverse=True)[k]  # (k+1)-th largest
    return {key: v - dec for key, v in counters.items() if v > dec}, dec


def _normalize_key(key):
    """pandas value_counts represents missing object keys as NaN/NA — fold
    every missing flavor back to None so NULL stays one key."""
    if key is None or key is pd.NaT or key is pd.NA:
        return None
    if isinstance(key, float) and pd.isna(key):
        return None
    return key


def heavy_hitters(df: DataFrame, key_col: str, k: int = DEFAULT_K) -> DataFrame:
    """(key, count_lb, count_ub, total_rows, max_undercount) for every key
    any partition's summary retained (≤ P·k rows). Guarantees
    (tests/test_heavyhitters.py asserts them literally):
      - count_lb ≤ true_count ≤ count_ub (= count_lb + max_undercount);
      - max_undercount (the exact summed per-partition d) ≤
        total_rows/(k+1), and every key with true_count > max_undercount
        is present — so k > 1/f guarantees every key above frequency
        fraction f is found.
    A key missing from one partition's summary contributes ≥ 0 there, so
    the cross-partition sum of retained counts stays a lower bound.
    Keys are returned as STRINGS (numeric key columns are cast at the
    select — frequency semantics are unchanged; distinct values stay
    distinct under the cast)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        d = 0
        n = 0
        for pdf in batches:
            s = pdf[key_col]
            n += len(s)
            counts = {
                _normalize_key(key): int(c)
                for key, c in s.value_counts(dropna=False).items()
            }
            counters, dec = mg_merge(counters, counts, k)
            d += dec
        rows = [
            {"key": key, "count_lb": v, "is_meta": False, "n_rows": 0, "decrements": 0}
            for key, v in counters.items()
        ]
        rows.append(
            {"key": None, "count_lb": 0, "is_meta": True, "n_rows": n, "decrements": d}
        )
        yield pd.DataFrame(rows, columns=[f.name for f in _MG_SCHEMA.fields])

    # keys are summarized AS STRINGS (the declared summary schema): the cast
    # makes any key column — host strings, numeric ids, n-grams — work at
    # the front door instead of dying in the Arrow serializer mid-stage
    parts = df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, _MG_SCHEMA
    )
    # ≤ P·(k+1) rows from here on: per-(key, is_meta) partial-agg sums, then
    # a single global window broadcasts the meta totals onto every candidate
    # row — one plan, one scan of df, nothing persisted
    agged = parts.groupBy("is_meta", "key").agg(
        F.sum("count_lb").alias("count_lb"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("decrements").alias("decrements"),
    )
    w = W.partitionBy()  # global — fine on a bounded-size frame
    meta_total = F.max(F.when(F.col("is_meta"), F.col("n_rows"))).over(w)
    meta_under = F.max(F.when(F.col("is_meta"), F.col("decrements"))).over(w)
    return (
        agged.withColumn("total_rows", meta_total)
        .withColumn("max_undercount", meta_under)
        .filter(~F.col("is_meta"))
        .select(
            "key",
            "count_lb",
            (F.col("count_lb") + F.col("max_undercount")).alias("count_ub"),
            "total_rows",
            "max_undercount",
        )
    )


def hot_keys(
    df: DataFrame,
    key_col: str,
    hot_fraction: float,
    k: int | None = None,
) -> list:
    """Sound hot-key detection for skew salting: every key with true
    frequency > hot_fraction·n is RETURNED — no misses, because with the
    default k = ceil(2/hot_fraction) the undercount bound is under
    hot_fraction·n/2, so a truly hot key's count_ub ≥ its true count >
    the threshold. Some returned keys may be merely warm (count_ub
    over-admits by ≤ max_undercount), which over-salts harmlessly. The
    driver collect is bounded by the candidate set (≤ P·k), filtered to
    the hot few."""
    if k is None:
        import math

        k = max(1, math.ceil(2.0 / hot_fraction))
    cands = heavy_hitters(df, key_col, k=k)
    rows = cands.filter(
        F.col("count_ub").cast("double") > hot_fraction * F.col("total_rows")
    ).collect()
    return [r["key"] for r in rows]
"""Named query plans + DuckDB oracle SQL — the driver-facing operator surface.

Each entry pairs an idiomatic-Spark DataFrame plan with an ANSI-SQL oracle
(DuckDB) over the same parquet tables (SURVEY.md §2C). Conventions that make
the order-insensitive value-hash comparison exact:
  - every computed column is aliased identically on both sides;
  - doubles that aggregate across rows are ROUND()ed identically on both
    sides (both engines round half-away-from-zero for doubles);
  - float math is forced to double *before* arithmetic on both sides, and
    both sides sum sequentially in the same element order, so results are
    bit-identical pre-rounding;
  - counts use COUNT(*) FILTER / F.count(F.when(...)) so both sides emit
    BIGINT (DuckDB's SUM(int) would emit HUGEINT);
  - timestamps leave the result as unix micros (exact integers) or
    formatted strings, never raw engine-native timestamps.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wikidataquality_spark.operators.heuristics import STOPWORDS, with_doc_stats
from wikidataquality_spark.rules.builder import apply_rules
from wikidataquality_spark.rules.model import COMPLIANCE, VIOLATION, Rule

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _unix_us(col: str):
    """Unix micros from a parquet TIMESTAMP_NTZ column. The session TZ is
    pinned to UTC (session.py), so NTZ→TZ cast is identity and the integer
    matches DuckDB's epoch_us() on the same naive value."""
    return F.unix_micros(F.col(col).cast("timestamp"))


# ---------------------------------------------------------------------------
# Quality-filter rule set over `documents` (the flagship family).
# Thresholds are frozen; they define the keep/drop semantics the golden
# fixtures are built from (BASELINE.md F1 target).
# ---------------------------------------------------------------------------

ALLOWED_LANGS = ("en", "fr", "es", "de", "zh")

FLAGSHIP_RULES = [
    Rule("range.mean_word_len", "range", {"column": "mean_word_len_stat", "min": "3", "max": "10"}),
    Rule("range.stopword_ratio", "range", {"column": "stopword_ratio_stat", "min": "0.02", "max": "1.0"}),
    Rule("range.doc_len", "range", {"column": "n_chars_stat", "min": "60", "max": "100000"}),
    Rule("one_of.lang", "one_of", {"column": "lang", "allowed": ",".join(ALLOWED_LANGS)}),
    Rule("single_value.distinct_words", "single_value", {"column": "distinct_word_ratio_stat", "min": "0.30"}),
    Rule("multi_value.min_words", "multi_value", {"column": "n_words_stat", "min": "15"}),
]

# Shared DuckDB CTE computing the same stats as operators/heuristics.py.
# Both engines: BIGINT token-length sum / DOUBLE count → identical IEEE result.
_STOPWORD_SQL = ",".join(f"'{w}'" for w in STOPWORDS)
_DOC_STATS_CTE = rf"""
WITH s AS (
  SELECT doc_id, lang, source,
    length(text) AS nc,
    len(string_split_regex(trim(text), '\s+')) AS nw,
    list_aggregate(list_transform(string_split_regex(trim(text), '\s+'), w -> length(w)), 'sum')
      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS mwl,
    len(list_filter(string_split_regex(trim(text), '\s+'), w -> w IN ({_STOPWORD_SQL})))
      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS swr,
    len(list_distinct(string_split_regex(trim(text), '\s+')))
      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS dwr,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
      / CAST(length(text) AS DOUBLE) AS alpha,
    length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g'))
      / CAST(length(text) AS DOUBLE) AS symr
  FROM documents)
"""

_LANG_SQL = ",".join(f"'{x}'" for x in ALLOWED_LANGS)
_RULE_PASS_SQL = {
    "range.mean_word_len": "(mwl BETWEEN 3 AND 10)",
    "range.stopword_ratio": "(swr BETWEEN 0.02 AND 1.0)",
    "range.doc_len": "(nc BETWEEN 60 AND 100000)",
    "one_of.lang": f"(lang IN ({_LANG_SQL}))",
    "single_value.distinct_words": "(dwr >= 0.30)",
    "multi_value.min_words": "(nw >= 15)",
}


@_register(
    "qf_doc_stats",
    _DOC_STATS_CTE
    + """
SELECT doc_id, nc AS n_chars_stat, nw AS n_words_stat,
       ROUND(mwl, 6) AS mean_word_len, ROUND(swr, 6) AS stopword_ratio,
       ROUND(dwr, 6) AS distinct_word_ratio, ROUND(alpha, 6) AS alpha_ratio,
       ROUND(symr, 6) AS symbol_ratio
FROM s
""",
)
def qf_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 heuristic statistics, pure Column expressions (SURVEY §2B)."""
    df = with_doc_stats(_t(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        F.col("n_chars_stat"),
        F.col("n_words_stat"),
        F.round("mean_word_len_stat", 6).alias("mean_word_len"),
        F.round("stopword_ratio_stat", 6).alias("stopword_ratio"),
        F.round("distinct_word_ratio_stat", 6).alias("distinct_word_ratio"),
        F.round("alpha_ratio_stat", 6).alias("alpha_ratio"),
        F.round("symbol_ratio_stat", 6).alias("symbol_ratio"),
    )


@_register(
    "qf_keep_decision",
    _DOC_STATS_CTE
    + f"""
SELECT doc_id, lang,
       ({" AND ".join(_RULE_PASS_SQL.values())}) AS keep,
       ({" + ".join(f"CASE WHEN {c} THEN 0 ELSE 1 END" for c in _RULE_PASS_SQL.values())}) AS n_violations
FROM s
""",
)
def qf_keep_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship validation DAG: rules → violations array → keep/drop
    (DelegatingConstraintChecker recast, SURVEY §2A#19)."""
    df = apply_rules(with_doc_stats(_t(spark, sf_dir, "documents")), FLAGSHIP_RULES)
    return df.select(
        "doc_id",
        "lang",
        "keep",
        F.size("violated_rules").cast("int").alias("n_violations"),
    )


@_register(
    "qf_rule_metrics",
    _DOC_STATS_CTE
    + "\nUNION ALL\n".join(
        f"""SELECT '{rid}' AS rule_id,
           COUNT(*) FILTER (WHERE {cond}) AS pass_count,
           COUNT(*) FILTER (WHERE NOT {cond}) AS fail_count FROM s"""
        for rid, cond in _RULE_PASS_SQL.items()
    ),
)
def qf_rule_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation statistics: per-rule pass/fail counts
    (≈ SpecialConstraintReport summaries, SURVEY §2A″)."""
    df = apply_rules(with_doc_stats(_t(spark, sf_dir, "documents")), FLAGSHIP_RULES)
    v = df.select(F.explode("violations").alias("v")).select("v.rule", "v.status")
    return v.groupBy(F.col("rule").alias("rule_id")).agg(
        F.count(F.when(F.col("status") == COMPLIANCE, 1)).alias("pass_count"),
        F.count(F.when(F.col("status") == VIOLATION, 1)).alias("fail_count"),
    )


@_register(
    "dedup_exact",
    """
SELECT doc_id FROM (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-level dedup: survivor = min doc_id per identical text
    (UniqueValueChecker recast, SURVEY §2A#7). At scale the window key is
    xxhash64(text) so the shuffle moves 8-byte keys, not documents."""
    df = _t(spark, sf_dir, "documents")
    w = W.partitionBy(F.xxhash64("text")).orderBy("doc_id")
    return (
        df.select("doc_id", "text")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


@_register(
    "scrub_blocklist",
    r"""
SELECT doc_id,
       regexp_replace(text, '\b(slow|big)\b', '[REDACTED]', 'g') AS scrubbed_text
FROM documents
""",
)
def scrub_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic regex scrub (FormatChecker-as-scrub, SURVEY §2A#1).
    Spark regexp_replace is global by default; DuckDB needs the 'g' flag."""
    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.regexp_replace("text", r"\b(slow|big)\b", "[REDACTED]").alias("scrubbed_text"),
    )


@_register(
    "token_count_by_source",
    r"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
       ROUND(AVG(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens
FROM documents GROUP BY source
""",
)
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rollup per source (training-data pipeline op)."""
    df = _t(spark, sf_dir, "documents")
    nw = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return df.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(nw.cast("long")).alias("total_tokens"),
        F.round(F.avg(nw), 4).alias("avg_tokens"),
    )


# ---------------------------------------------------------------------------
# Relational surface — TPC-H-ish (SURVEY §2C: joins, aggs, windows, set ops).
# ---------------------------------------------------------------------------


@_register(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-01-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → partial+final hash agg (map-side combine
    is automatic); the shipdate filter pushes into the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-01-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@_register(
    "q3_top_revenue_orders",
    """
SELECT o.o_orderkey, o.o_orderdate,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim broadcast → fact join → agg → top-k.
    Customer is tiny → explicit broadcast; ties broken by o_orderkey so the
    LIMIT is a deterministic total order."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "revenue")
    )


ORACLE["q3_top_revenue_orders"] = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, revenue FROM (
  SELECT o.o_orderkey, o.o_orderdate,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
  GROUP BY o.o_orderkey, o.o_orderdate
  ORDER BY revenue DESC, o.o_orderkey
  LIMIT 10)
"""


@_register(
    "q5_nation_revenue",
    """
SELECT n.n_name, r.r_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × three broadcast dims → single shuffle for the agg."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@_register(
    "semi_join_active_customers",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@_register(
    "anti_join_idle_customers",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
""",
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join (NOT EXISTS) — customers with no large order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_register(
    "window_topk_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the scalable top-k idiom (no global sort)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


@_register(
    "window_running_customer_spend",
    """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
""",
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + lag in one window spec (frames, SURVEY §2C)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@_register(
    "rollup_order_status",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@_register(
    "distinct_parts_per_flag",
    """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct (expand + two-phase agg under the hood)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


@_register(
    "setop_segment_overlap",
    """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
""",
)
def setop_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.intersect(o)


@_register(
    "setop_segment_except",
    """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
""",
)
def setop_segment_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.exceptAll(o).distinct()


@_register(
    "string_funcs_part",
    """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 5) AS name_prefix,
       p_brand || ':' || p_type AS brand_type,
       length(p_name) AS name_len,
       levenshtein(p_name, 'red widget') AS lev_dist
FROM part
""",
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: upper/substring/concat/length/levenshtein."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.levenshtein(F.col("p_name"), F.lit("red widget")).cast("long").alias("lev_dist"),
    )


@_register(
    "orders_by_month",
    """
SELECT strftime(o_orderdate, '%Y-%m') AS ym,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS month_total
FROM orders GROUP BY 1
""",
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date bucketing: truncate-to-month as a formatted string (TZ-safe vs oracle)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("month_total"),
    )


@_register(
    "range_join_price_bands",
    """
SELECT b.band_id, COUNT(*) AS n_orders, ROUND(SUM(o.o_totalprice), 2) AS band_total
FROM orders o
JOIN (VALUES (0, 0.0, 100000.0), (1, 100000.0, 300000.0), (2, 300000.0, 10000000.0))
     AS b(band_id, lo, hi)
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_id
""",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join against a tiny literal dim — Spark executes
    it as a BroadcastNestedLoopJoin, which is the right plan for a 3-row dim."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(0, 0.0, 100000.0), (1, 100000.0, 300000.0), (2, 300000.0, 10000000.0)],
        "band_id int, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("band_total"))
    )


# ---------------------------------------------------------------------------
# Events: JSON, time windows, sessionization, as-of join (SURVEY §2C).
# ---------------------------------------------------------------------------


@_register(
    "json_events_filter",
    """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS avg_value
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
GROUP BY event_type
""",
)
def json_events_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured: extract a JSON field, filter, aggregate."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.filter(k > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@_register(
    "events_hourly",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_bucket,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch analogue of the streaming hourly agg;
    the streaming twin lives in streaming/windows.py)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour_bucket"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))


@_register(
    "sessionize_users",
    """
SELECT user_id,
       COUNT(*) FILTER (WHERE gap_us IS NULL OR gap_us > 1800000000) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap_us
  FROM events)
GROUP BY user_id
""",
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a new session. Integer (unix
    micros) math so both engines agree exactly."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = _unix_us("ts")
    gap = us - F.lag(us).over(w)
    return (
        e.withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("gap_us").isNull() | (F.col("gap_us") > 1_800_000_000), 1)).alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@_register(
    "asof_purchase_last_click",
    """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, last_click_us
FROM (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
  FROM events)
WHERE event_type = 'purchase'
""",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join expressed as a single-pass window — each purchase
    gets the user's most recent strictly-prior click. One shuffle on user_id,
    no self-join blowup (SURVEY §2C 'as-of join')."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", _unix_us("ts"))
    ).over(w)
    return (
        e.withColumn("last_click_us", last_click)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", _unix_us("ts").alias("ts_us"), "last_click_us")
    )


# ---------------------------------------------------------------------------
# Embeddings: vector math + similarity search (training-data pipeline ops).
# ---------------------------------------------------------------------------

# Both sides: cast each float to double BEFORE multiply, sum sequentially in
# element order → bit-identical doubles pre-ROUND.
_DOT_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@_register(
    "embedding_norms",
    f"""
SELECT vec_id, label,
       ROUND(sqrt({_DOT_SQL.format(a="embedding", b="embedding")}), 4) AS l2_norm
FROM embeddings
""",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via array HOFs (zip_with + aggregate) — no UDF."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.round(F.sqrt(_dot(F.col("embedding"), F.col("embedding"))), 4).alias("l2_norm"),
    )


@_register(
    "ann_cosine_threshold",
    f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id,
         {_DOT_SQL.format(a="e.embedding", b="q.q_emb")} /
         (sqrt({_DOT_SQL.format(a="e.embedding", b="e.embedding")}) *
          sqrt({_DOT_SQL.format(a="q.q_emb", b="q.q_emb")})) AS cs
  FROM embeddings e, q
  WHERE e.vec_id <> 0)
SELECT vec_id, ROUND(cs, 4) AS cos_sim FROM sims WHERE cs >= 0.15
""",
)
def ann_cosine_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine similarity vs a query vector (broadcast the 1-row
    query side; the scan side streams). The LSH-bucketed scale path lives in
    operators/simsearch.py."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    joined = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    cs = _dot(F.col("embedding"), F.col("q_emb")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
    )
    return (
        joined.withColumn("cs", cs)
        .filter(F.col("cs") >= 0.15)
        .select("vec_id", F.round("cs", 4).alias("cos_sim"))
    )


@_register(
    "knn_cosine_topk",
    f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.q_id, e.vec_id,
         {_DOT_SQL.format(a="e.embedding", b="q.q_vec")} /
         (sqrt({_DOT_SQL.format(a="e.embedding", b="e.embedding")}) *
          sqrt({_DOT_SQL.format(a="q.q_vec", b="q.q_vec")})) AS cs
  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
SELECT q_id, vec_id, ROUND(cs, 4) AS cos_sim, rank FROM (
  SELECT q_id, vec_id, cs,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
""",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN per query vector (brute-force baseline of the similarity-
    search family; operators/simsearch.py holds the LSH scale path)."""
    from wikidataquality_spark.operators.simsearch import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = brute_force_topk(e, q, k=5, exclude_self=True)
    return out.select(
        "q_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), F.col("rank").cast("long").alias("rank")
    )


@_register(
    "embedding_neardup_pairs",
    f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_SQL.format(a="embedding", b="embedding")}) AS nrm
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_DOT_SQL.format(a="a.embedding", b="b.embedding")} / (a.nrm * b.nrm), 4) AS cos_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_DOT_SQL.format(a="a.embedding", b="b.embedding")} / (a.nrm * b.nrm) >= 0.5
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b). Exact self-join at test
    scale; simsearch.lsh_ann buckets make it linear at corpus scale."""
    from wikidataquality_spark.operators import simsearch

    e = _t(spark, sf_dir, "embeddings")
    out = simsearch.embedding_neardup_pairs(e, threshold=0.5)
    return out.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))


# ---------------------------------------------------------------------------
# Text analysis: fingerprints, n-gram similarity, quality scores, tokenization.
# ---------------------------------------------------------------------------


@_register(
    "doc_fingerprints",
    rf"""
WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)
SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    [list_reduce(list_prepend(CAST(0 AS BIGINT),
        [CAST(ascii(c) AS BIGINT) for c in string_split(word, '')]),
      (acc, x) -> (acc * 131 + x) % {1_099_511_627_689})
     for word in words]),
    (acc, x) -> (acc * 31 + x) % {1_099_511_627_689}) AS fingerprint
FROM w
""",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (whitespace-invariant content id)."""
    from wikidataquality_spark.operators.textstats import rolling_fingerprint

    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint"))


@_register(
    "ngram_jaccard_pairs",
    r"""
WITH g AS (
  SELECT doc_id, source,
         list_distinct([array_to_string(words[i:i+2], ' ')
                        for i in generate_series(1, len(words)-2)]) AS grams
  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS words
        FROM documents)
  WHERE len(words) >= 3)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.grams, b.grams)) /
             CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE), 6) AS jaccard
FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams)) /
      CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE) >= 0.01
""",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard similarity between documents of the same source
    (n-gram near-dup family; blocked on `source` so the self-join is
    per-partition, not corpus²)."""
    from wikidataquality_spark.operators.textstats import ngram_jaccard, word_ngrams

    df = _t(spark, sf_dir, "documents")
    g = df.select(
        "doc_id",
        "source",
        F.array_distinct(word_ngrams(F.col("text"), 3)).alias("grams"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("nw"),
    ).filter(F.col("nw") >= 3)
    a = g.select(F.col("doc_id").alias("id_a"), F.col("source"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("source"), F.col("grams").alias("gb"))
    pairs = a.join(b, ["source"]).filter(F.col("id_a") < F.col("id_b"))
    jac = ngram_jaccard(F.col("ga"), F.col("gb"))
    return (
        pairs.withColumn("j", jac)
        .filter(F.col("j") >= 0.01)
        .select("id_a", "id_b", F.round("j", 6).alias("jaccard"))
    )


@_register(
    "quality_scores",
    _DOC_STATS_CTE
    + """
SELECT doc_id,
       ROUND((CASE WHEN mwl BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END) * 0.2
             + LEAST(swr * 5, 1.0) * 0.2
             + GREATEST(1.0 - symr * 5, 0.0) * 0.2
             + dwr * 0.2
             + alpha * 0.2, 6) AS quality_score
FROM s
""",
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite heuristic quality score (curriculum-sampling signal)."""
    from wikidataquality_spark.operators.textstats import quality_score

    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality_score"))


@_register(
    "bpe_token_counts",
    r"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]'))) AS BIGINT) AS total_pieces,
       COUNT(*) AS n_docs
FROM documents GROUP BY source
""",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer piece counts per source."""
    from wikidataquality_spark.operators.textstats import bpe_ish_token_count

    df = _t(spark, sf_dir, "documents")
    return df.groupBy("source").agg(
        F.sum(bpe_ish_token_count(F.col("text")).cast("long")).alias("total_pieces"),
        F.count("*").alias("n_docs"),
    )


@_register("minhash_neardup_docs", None)  # UDF signature path — rows-only check
def minhash_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup survivors over documents (the corpus-scale dedup
    operator; no SQL oracle — signatures are a pandas-UDF computation)."""
    from wikidataquality_spark.operators.dedup import minhash_dedup

    df = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_dedup(df, text_col="text", id_col="doc_id").select("doc_id")


@_register("simhash_neardup_docs", None)  # UDF signature path — rows-only check
def simhash_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup survivors (hamming ≤ 3 on 64-bit signatures; banding
    for candidates + exact bit_count verify — operators/dedup.py)."""
    from wikidataquality_spark.operators.dedup import simhash_dedup

    df = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_dedup(df, text_col="text", id_col="doc_id").select("doc_id")


@_register(
    "scrub_pii_all",
    r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\+?\d{1,2}[-. ]\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}', '<PHONE>', 'g'),
      '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
    '\b(badword|toxicword|slurword)\b', '<REDACTED>', 'g') AS scrubbed_text
FROM documents
""",
)
def scrub_pii_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PII+toxicity scrub chain (operators/scrub.py pattern
    order is frozen; both engines apply the same ordered sequence)."""
    from wikidataquality_spark.operators.scrub import scrub_column

    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", scrub_column("text").alias("scrubbed_text"))


# ---------------------------------------------------------------------------
# More relational/statistical surface.
# ---------------------------------------------------------------------------


@_register(
    "cube_lineitem_status",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@_register(
    "pivot_orders_status",
    """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order-status columns per priority (explicit value list so the
    plan is a single agg, no extra distinct pass)."""
    o = _t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("P", F.lit(0)).alias("status_P"),
    )


@_register(
    "median_price_by_status",
    """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders GROUP BY o_orderstatus
""",
)
def median_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation — matches quantile_cont)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@_register(
    "stats_by_returnflag",
    """
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
       ROUND(var_samp(l_discount), 6) AS var_disc,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
""",
)
def stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@_register(
    "window_rank_functions",
    """
SELECT o_orderkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       NTILE(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface: rank / dense_rank / percent_rank / ntile."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@_register(
    "array_ops_embedding",
    """
SELECT vec_id,
       len(embedding) AS dim,
       array_to_string(list_transform(embedding[1:5], x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,4))), ',') AS head5,
       array_to_string(list_transform(list_reverse_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[1:3],
                      x -> CAST(x AS DECIMAL(18,4))), ',') AS top3,
       ROUND(CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max') AS DOUBLE), 4) AS vmax
FROM embeddings WHERE vec_id < 10
""",
)
def array_ops_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: size / slice / sort_array desc / transform /
    array_max — all JVM-side HOFs, no UDF. Array outputs are joined to scalar
    strings (concat_ws) so the driver's pandas canonicalizer can hash them."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.concat_ws(
            ",",
            F.transform(F.slice("embedding", 1, 5), lambda x: x.cast("double").cast("decimal(18,4)")),
        ).alias("head5"),
        F.concat_ws(
            ",",
            F.transform(F.slice(F.sort_array(dbl, asc=False), 1, 3), lambda x: x.cast("decimal(18,4)")),
        ).alias("top3"),
        F.round(F.array_max(dbl), 4).alias("vmax"),
    )


@_register(
    "orders_date_arithmetic",
    """
SELECT o_orderkey,
       date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_95,
       strftime(o_orderdate::DATE + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
       EXTRACT(quarter FROM o_orderdate) AS q
FROM orders WHERE o_orderkey < 1000
""",
)
def orders_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: datediff / date_add / last_day / quarter."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.datediff(d, F.lit("1995-01-01")).cast("long").alias("days_since_95"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("q"),
    )


# ---------------------------------------------------------------------------
# Streaming twins (run the real Structured Streaming path on the bounded
# events table; memory sink driven to completion inside the query fn).
# ---------------------------------------------------------------------------


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import tempfile

    src_file = os.path.join(sf_dir, "events.parquet")
    # streaming file sources want a directory: shim via a symlink dir
    key = hashlib.md5(src_file.encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"wdq_stream_events_{key}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src_file, link)

    schema = _t(spark, sf_dir, "events").schema
    src = spark.readStream.schema(schema).parquet(d)
    # parquet gives TIMESTAMP_NTZ; watermarks/windows need TIMESTAMP (UTC session)
    return src.withColumn("ts", F.col("ts").cast("timestamp"))


@_register(
    "stream_hourly_counts",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_bucket,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
)
def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window counts (complete mode over the
    bounded source → equals the batch group-by, so it is oracle-checkable)."""
    from wikidataquality_spark.streaming.windows import run_stream_to_memory

    src = _events_stream(spark, sf_dir).withWatermark(
        "ts", "10 minutes"
    )
    agg = src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count("*").alias("n")
    )
    out = run_stream_to_memory(spark, agg, output_mode="complete")
    return out.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour_bucket"),
        "event_type",
        "n",
    )


@_register(
    "stream_dedup_event_ids",
    "SELECT COUNT(DISTINCT event_id) AS n_unique FROM events",
)
def stream_dedup_event_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over the stream; count survivors."""
    from wikidataquality_spark.streaming.windows import (
        dedup_within_watermark,
        run_stream_to_memory,
    )

    src = _events_stream(spark, sf_dir)
    deduped = dedup_within_watermark(src)
    out = run_stream_to_memory(spark, deduped, output_mode="append")
    return out.agg(F.count_distinct("event_id").alias("n_unique"))


@_register(
    "stream_sliding_avg",
    """
SELECT (epoch_us(ts) // 600000000 - i) * 600000000 AS win_start_us,
       event_type, COUNT(*) AS n
FROM events, generate_series(0, 2) AS t(i)
GROUP BY 1, 2
""",
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sliding windows (30 min / 10 min slide) in
    complete mode over the bounded source — equals the batch overlap-bucket
    aggregation, so the integer-bucket oracle applies. The compared columns
    are integer-exact (counts): the avg the operator also computes
    accumulates in streaming-state order, which differs from the oracle's
    scan order in the last ulp at larger SFs."""
    from wikidataquality_spark.streaming.windows import (
        run_stream_to_memory,
        sliding_value_avg,
    )

    src = _events_stream(spark, sf_dir)
    out = run_stream_to_memory(spark, sliding_value_avg(src), output_mode="complete")
    return out.select(
        F.unix_micros("win.start").alias("win_start_us"),
        "event_type",
        "n",
    )


@_register("stream_session_windows", None)  # session_window start/end are
# engine-defined; rows-only check
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows per user over the stream (30-min gap)."""
    from wikidataquality_spark.streaming.windows import (
        run_stream_to_memory,
        session_windows,
    )

    src = _events_stream(spark, sf_dir)
    out = run_stream_to_memory(spark, session_windows(src), output_mode="complete")
    return out.select(
        "user_id", F.col("sess.start").cast("long").alias("sess_start_s"), "n_events"
    )


@_register("stream_incremental_validate", None)  # model pipeline — rows-only
def stream_incremental_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end incremental validation (EvaluateConstraintReportJob recast,
    SURVEY §2A″): a pages corpus streams in as 3 micro-batches
    (maxFilesPerTrigger=1); foreachBatch runs the FULL batch pipeline per
    micro-batch and appends to the sink exactly-once via the checkpoint.
    Returns the per-batch-accumulated results — deterministic, so the
    driver's repeated rows-only runs agree (sink is rebuilt per call)."""
    import shutil
    import tempfile

    from wikidataquality_spark.datagen import write_pages_parquet
    from wikidataquality_spark.streaming.windows import incremental_validate

    base = tempfile.gettempdir()
    corpus = write_pages_parquet(f"{base}/wdq_incr/pages_300.parquet", 300, seed=99)
    split_dir = f"{base}/wdq_incr/split"
    if not os.path.exists(os.path.join(split_dir, "_SUCCESS")):
        spark.read.parquet(corpus).repartition(3).write.mode("overwrite").parquet(split_dir)

    sink = f"{base}/wdq_incr/sink"
    ckpt = f"{base}/wdq_incr/ckpt"
    for d in (sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    schema = spark.read.parquet(split_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    q = incremental_validate(spark, stream, sink, ckpt)
    q.awaitTermination()
    out = spark.read.parquet(sink)
    return out.select("url", "keep", F.size("violated_rules").cast("int").alias("n_violations"))


@_register(
    "stateful_user_stats",
    """
SELECT user_id, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value,
       MAX(epoch_us(ts)) AS last_seen_us
FROM events GROUP BY user_id
""",
)
def stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running count/sum/last-seen kept in the state store across micro-batches.
    The bounded source is driven to completion; the final update per user
    (max n_events — counts are monotone) equals the batch aggregate, which is
    what the oracle checks."""
    from pyspark.sql import Window as WW

    from wikidataquality_spark.streaming.stateful import running_user_stats
    from wikidataquality_spark.streaming.windows import run_stream_to_memory

    src = _events_stream(spark, sf_dir)
    out = run_stream_to_memory(spark, running_user_stats(src), output_mode="update")
    w = WW.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 2).alias("total_value"),
            "last_seen_us",
        )
    )


# ---------------------------------------------------------------------------
# UDF surface (SURVEY §2C last row): grouped-map applyInPandas, grouped-agg
# pandas UDAF, mapInArrow — each against a plain-SQL oracle.
# ---------------------------------------------------------------------------


@_register(
    "grouped_map_source_zscore",
    """
SELECT doc_id,
       ROUND((length(text) - AVG(length(text)) OVER (PARTITION BY source))
             / stddev_samp(length(text)) OVER (PARTITION BY source), 4) AS len_z
FROM documents
""",
)
def grouped_map_source_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-source z-score of document length.
    One shuffle on the group key; each group arrives as one pandas frame
    (the per-host normalization idiom for quality-score calibration)."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("n")
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n"].mean()
        sd = pdf["n"].std(ddof=1)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "len_z": ((pdf["n"] - mu) / sd).round(4)}
        )

    return docs.groupBy("source").applyInPandas(zscore, "doc_id long, len_z double")


@_register(
    "grouped_agg_geomean",
    """
SELECT o_orderstatus,
       ROUND(exp(AVG(ln(o_totalprice))), 4) AS geo_mean_price
FROM orders GROUP BY o_orderstatus
""",
)
def grouped_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: geometric mean (no Spark built-in).
    Arrow-batched per group; log-space for numeric stability."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG functionType: this module's postponed annotations
    # (`from __future__ import annotations`) break Series→scalar hint inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(geomean("o_totalprice"), 4).alias("geo_mean_price")
    )


@_register(
    "mapinarrow_char_count",
    "SELECT doc_id, length(text) AS n_chars FROM documents",
)
def mapinarrow_char_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: zero-copy RecordBatch pass computing utf8 lengths with
    pyarrow.compute — the lowest-overhead Python hook (no pandas conversion)."""
    from collections.abc import Iterator

    import pyarrow as pa
    import pyarrow.compute as pc

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def char_count(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pc.cast(pc.utf8_length(batch.column(1)), pa.int64())],
                names=["doc_id", "n_chars"],
            )

    return docs.mapInArrow(char_count, "doc_id long, n_chars long")


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary media columns; deterministic fake decode).
# ---------------------------------------------------------------------------


@_register("multimodal_image_features", None)  # binary plumbing — rows-only
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode→resize→features over binary blobs via mapInPandas
    (deterministic fake decoder; operators/multimodal.py documents the
    real-codec swap-in)."""
    from wikidataquality_spark.operators.multimodal import (
        image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=64)
    return image_features(media, deterministic_fake=True).select(
        "media_id", "n_bytes", "content_hash", F.round("mean_luma", 4).alias("mean_luma")
    )


@_register("multimodal_frame_sample", None)  # binary plumbing — rows-only
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1:N mapInPandas expansion) with metadata-only
    pre-filtering so image rows never reach the demux stage."""
    from wikidataquality_spark.operators.multimodal import (
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=64).filter(F.col("meta.kind") == "video")
    return sample_frames(media, every_nth=10, deterministic_fake=True).select(
        "media_id", "frame_index", F.length("frame_blob").alias("frame_bytes")
    )


# ---------------------------------------------------------------------------
# IVF ANN + approx aggregates.
# ---------------------------------------------------------------------------


@_register(
    "ivf_ann_topk",
    f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.q_id, e.vec_id,
         {_DOT_SQL.format(a="e.embedding", b="q.q_vec")} /
         (sqrt({_DOT_SQL.format(a="e.embedding", b="e.embedding")}) *
          sqrt({_DOT_SQL.format(a="q.q_vec", b="q.q_vec")})) AS cs
  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
SELECT q_id, vec_id, ROUND(cs, 4) AS cos_sim, rank FROM (
  SELECT q_id, vec_id, cs,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
""",
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with n_probe = n_lists (exhaustive probing) — exercises the
    full cell-assign → probe → re-rank machinery while staying exactly equal
    to brute force, so the oracle is the exact k-NN SQL. Production recall
    mode (n_probe < n_lists) is covered by tests/test_simsearch.py."""
    from wikidataquality_spark.operators.simsearch import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_topk(e, q, k=5, n_lists=4, n_probe=4)
    return out.select(
        "q_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), F.col("rank").cast("long").alias("rank")
    )


@_register("approx_distinct_users", None)  # sketch output — rows-only check
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct per event_type (the 10^12-doc
    cardinality primitive; exact distinct is its own shuffle of every key)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# CSV / JSON source round-trips (maintenance-import parity, SURVEY §2A″).
# ---------------------------------------------------------------------------


@_register(
    "csv_source_orders_agg",
    """
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
""",
)
def csv_source_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan path: orders exported once to CSV (idempotent), read back
    with an EXPLICIT schema (no inference pass), aggregated. The oracle runs
    on the canonical parquet — equality proves lossless round-trip."""
    import hashlib
    import tempfile

    from wikidataquality_spark.io.formats import export_once, read_csv

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = export_once(o, f"{tempfile.gettempdir()}/wdq_csv_orders_{key}", "csv")
    schema = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
    from pyspark.sql.types import StructType

    back = read_csv(spark, path, StructType.fromDDL(schema))
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@_register(
    "json_source_events_agg",
    """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY event_type
""",
)
def json_source_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan path (explicit schema), same lossless-round-trip proof
    as the CSV twin."""
    import hashlib
    import tempfile

    from wikidataquality_spark.io.formats import export_once, read_json

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = export_once(e, f"{tempfile.gettempdir()}/wdq_json_events_{key}", "json")
    from pyspark.sql.types import StructType

    back = read_json(
        spark, path, StructType.fromDDL("event_id bigint, event_type string, value double")
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


# ---------------------------------------------------------------------------
# Additional relational surface: full join, range frames, sliding windows,
# unionByName.
# ---------------------------------------------------------------------------


@_register(
    "full_join_customer_orders",
    """
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       COUNT(o.o_orderkey) AS n_orders,
       MAX(c.c_mktsegment) AS segment
FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY 1
""",
)
def full_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (customers with no orders AND orphan orders survive)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full")
    return j.groupBy(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey")
    ).agg(
        F.count("o_orderkey").alias("n_orders"),
        F.max("c_mktsegment").alias("segment"),
    )


@_register(
    "window_range_frame",
    """
SELECT o_orderkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_near_price
FROM orders
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per customer, how many of
    their orders fall within ±10000 of each order's price."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select("o_orderkey", F.count("*").over(w).alias("n_near_price"))


@_register(
    "events_sliding_windows",
    """
SELECT (epoch_us(ts) // 600000000 - i) * 600000000 AS win_start_us,
       event_type, COUNT(*) AS n
FROM events, generate_series(0, 2) AS t(i)
GROUP BY 1, 2
""",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (30-min size, 10-min slide) in batch mode: every event
    lands in exactly 3 overlapping epoch-aligned windows, so the oracle is
    pure integer bucket math (the streaming twin is
    streaming/windows.sliding_value_avg). Window starts emitted as unix
    micros — exact integers on both engines."""
    e = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    return e.groupBy(
        F.window("ts", "30 minutes", "10 minutes").alias("win"), "event_type"
    ).agg(F.count("*").alias("n")).select(
        F.unix_micros("win.start").alias("win_start_us"),
        "event_type",
        "n",
    )


@_register(
    "events_props_map",
    """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
       len(json_keys(props)) AS n_keys
FROM events WHERE CAST(json_extract(props, '$.k') AS INTEGER) % 7 = 0
""",
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full JSON-map surface: from_json to MapType, element_at, map_keys
    (vs the lighter get_json_object path in json_events_filter)."""
    from pyspark.sql.types import IntegerType, MapType, StringType

    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    return (
        e.withColumn("_m", m)
        .select(
            "event_id",
            F.element_at("_m", "k").alias("k_val"),
            F.size(F.map_keys("_m")).cast("long").alias("n_keys"),
        )
        .filter(F.col("k_val") % 7 == 0)
    )


@_register(
    "null_safe_user_join",
    """
WITH a AS (SELECT DISTINCT CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS u
           FROM events WHERE event_type = 'click'),
     b AS (SELECT DISTINCT CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS u
           FROM events WHERE event_type = 'purchase')
SELECT COUNT(*) AS n_matched,
       COUNT(*) FILTER (WHERE a.u IS NULL) AS n_null_matched
FROM a JOIN b ON a.u IS NOT DISTINCT FROM b.u
""",
)
def null_safe_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=>): NULL keys match each other, unlike `=`."""
    e = _t(spark, sf_dir, "events")
    u = F.when(F.col("user_id") % 10 == 0, F.lit(None)).otherwise(F.col("user_id"))
    a = e.filter(F.col("event_type") == "click").select(u.alias("u")).distinct()
    b = e.filter(F.col("event_type") == "purchase").select(u.alias("ub")).distinct()
    j = a.join(b, a.u.eqNullSafe(b.ub))
    return j.agg(
        F.count("*").alias("n_matched"),
        F.count(F.when(F.col("u").isNull(), 1)).alias("n_null_matched"),
    )


@_register(
    "posexplode_embedding",
    """
SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
FROM embeddings, generate_series(1, 4096) AS t(i)
WHERE vec_id < 3 AND i <= len(embedding)
""",
)
def posexplode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, value) rows; float widened to double is
    exact on both engines."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 3)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), F.col("v").cast("double").alias("val"))


@_register("langid_ngram_docs", None)  # model inference — rows-only check
def langid_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style char-trigram language ID over documents (frozen
    supervised model, operators/langid_ngram.py; 'und' = junk class)."""
    from wikidataquality_spark.operators.langid_ngram import ngram_langid

    df = _t(spark, sf_dir, "documents")
    res = ngram_langid("text")
    return df.select(
        "doc_id",
        res["lang_pred"].alias("lang_pred"),
        F.round(res["lang_conf"], 4).alias("lang_conf"),
    )


@_register("approx_percentile_price", None)  # sketch output — rows-only check
def approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest class sketch): the 10^12-row quantile path
    — exact percentile is a full sort per group."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), 10000).alias("p50_p90")
    ).select("o_orderstatus", F.col("p50_p90")[0].alias("p50"), F.col("p50_p90")[1].alias("p90"))


@_register(
    "union_by_name_sources",
    """
SELECT kind, COUNT(*) AS n FROM (
  SELECT 'order' AS kind, o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
  UNION ALL
  SELECT 'customer' AS kind, c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY kind
""",
)
def union_by_name_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered projections (position-safe)."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"), F.lit("order").alias("kind"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.lit("customer").alias("kind"), F.col("c_custkey").alias("custkey"))
    )
    return o.unionByName(c).groupBy("kind").agg(F.count("*").alias("n"))

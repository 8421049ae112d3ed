"""Physical-plan audit → PLANS.md.

For each audited query: run .explain('formatted') BEFORE execution (initial
AQE plan) and grade the signals that matter at 100 TB:

  - pushed:    filters reached the parquet scan (PushedFilters non-empty)
  - pruned:    scan reads only referenced columns (ReadSchema subset)
  - broadcast: dimension joins are BroadcastHashJoin, not sort-merge
  - no_cartesian: no CartesianProduct anywhere
  - topk:      global order+limit compiles to TakeOrderedAndProject
  - partial_agg: aggregation is partial+final (map-side combine)

Usage: python tools/plan_audit.py   (writes PLANS.md, prints the table)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wikidataquality_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# query → signals that MUST hold for the plan to be accepted
EXPECTATIONS: dict[str, list[str]] = {
    "q1_pricing_summary": ["pushed", "pruned", "partial_agg", "no_cartesian"],
    "q3_top_revenue_orders": ["pushed", "broadcast", "topk", "no_cartesian"],
    "q5_nation_revenue": ["broadcast", "partial_agg", "no_cartesian"],
    "semi_anti_join_customers": ["pushed", "broadcast", "no_cartesian"],
    "symmetric_inverse_checks": ["pushed", "no_cartesian", "no_nested_loop", "equi_join"],
    "window_topk_orders_per_customer": ["pruned", "no_cartesian"],
    "dedup_exact": ["pruned", "no_cartesian"],
    "qf_keep_decision": ["pruned", "no_cartesian"],
    "token_count_by_source": ["pruned", "partial_agg", "no_cartesian"],
    "events_windows": ["pruned", "partial_agg", "no_cartesian"],
    "asof_purchase_last_click": ["pruned", "no_cartesian"],
    "knn_cosine_topk": ["no_cartesian"],  # broadcast NL join IS the plan (tiny query side)
    "range_join_price_bands": ["no_cartesian"],  # broadcast NL join on 3-row dim
    "json_map_events": ["pruned", "partial_agg", "no_cartesian"],
    "grouped_map_source_zscore": ["pruned", "no_cartesian"],
    "full_join_customer_orders": ["pruned", "partial_agg", "no_cartesian"],
    "window_rank_functions": ["pruned", "no_cartesian"],
    "fileformat_roundtrip_agg": ["partial_agg", "no_cartesian"],
    "ivf_ann_topk": ["broadcast", "no_cartesian"],
    "setop_segments": ["pushed", "no_cartesian"],
    "grouping_sets_summary": ["pruned", "partial_agg", "no_cartesian"],
    "stats_by_returnflag": ["pruned", "partial_agg", "no_cartesian"],
    # the two r01 scale-killers, now equi-join shaped (VERDICT #5/#6):
    # candidate generation must be an equi-join — no nested-loop, no cartesian
    "embedding_neardup_pairs": ["no_cartesian", "no_nested_loop", "equi_join"],
    "ngram_jaccard_pairs": ["no_cartesian", "no_nested_loop", "equi_join"],
    "crosscheck_docs_vs_golden": ["pruned", "broadcast", "no_cartesian", "no_nested_loop"],
    "dump_meta_enrich": ["pruned", "broadcast", "no_cartesian"],
    "minhash_neardup_docs": ["pruned", "no_cartesian", "no_nested_loop"],
    "simhash_neardup_docs": ["pruned", "no_cartesian", "no_nested_loop"],
    "orders_by_month": ["pruned", "partial_agg", "no_cartesian"],
}


def _field_count(struct: str) -> int:
    """Top-level field count of a ReadSchema struct<...> string (depth-aware:
    nested struct/array/map commas don't count)."""
    depth = 0
    n = 1
    for ch in struct:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n if struct.strip() else 0


def _full_widths() -> dict[str, int]:
    import pyarrow.parquet as pq

    widths = {}
    for f in os.listdir(SF):
        if f.endswith(".parquet"):
            path = os.path.join(SF, f)
            if os.path.isdir(path):
                part = next(
                    (
                        os.path.join(path, p)
                        for p in sorted(os.listdir(path))
                        if p.endswith(".parquet")
                    ),
                    None,
                )
                if part is None:
                    continue
                path = part
            widths[f[: -len(".parquet")]] = len(pq.read_schema(path).names)
    return widths


_WIDTHS: dict[str, int] = {}


def pruned_ok(plan: str) -> bool:
    """TRUE only when every parquet scan of a ≥5-column base table reads
    STRICTLY fewer columns than the table has. The old check ('ReadSchema'
    appears in the plan) was vacuously true for every file-scan plan — a
    regression to select-* could never fail it. Narrow tables (≤4 cols,
    e.g. region/nation) are exempt: reading all of them is legitimate."""
    if not _WIDTHS:
        _WIDTHS.update(_full_widths())
    # in formatted explain, ReadSchema follows Location within a couple of
    # lines inside the same scan block; the bounded gap stops a scan missing
    # its ReadSchema from pairing with the NEXT scan's
    scans = re.findall(
        r"Location:[^\n]*?/([a-z_]+)\.parquet[^\n]*\n(?:[^\n]*\n){0,3}?"
        r"[^\n]*ReadSchema: struct<(.*?)>\n",
        plan,
    )
    # fail CLOSED: every base-table scan must have a parsed ReadSchema — a
    # truncated schema string (metadata length cap) or a changed explain
    # layout would otherwise make this check vacuously green
    n_locations = len(
        re.findall(r"Location:[^\n]*?/(?:[a-z_]+)\.parquet", plan)
    )
    if n_locations != len(scans):
        return False
    for table, struct in scans:
        full = _WIDTHS.get(table)
        if full is None or full <= 4:
            continue
        if _field_count(struct) >= full:
            return False
    return True


def signals(plan: str) -> dict[str, bool]:
    return {
        "pushed": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\]", plan),
        "pruned": "ReadSchema" in plan and pruned_ok(plan),
        "broadcast": "BroadcastHashJoin" in plan,
        "topk": "TakeOrderedAndProject" in plan,
        "partial_agg": "partial_" in plan,
        "no_cartesian": "CartesianProduct" not in plan,
        "no_nested_loop": "BroadcastNestedLoopJoin" not in plan,
        "equi_join": any(
            j in plan
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        ),
    }


def main() -> int:
    from wikidataquality_spark.plans.driver_queries import QUERIES

    # maxMetadataStringLength: explain() truncates metadata values at 100
    # chars by default — a WIDE table's unpruned ReadSchema would lose its
    # closing '>' and silently escape the pruned_ok regex, failing the gate
    # OPEN for exactly the select-* regression it exists to catch
    spark = get_spark(
        cpus=8, extra_conf={"spark.sql.maxMetadataStringLength": "4096"}
    )
    rows = []
    failed = []
    for name, must in EXPECTATIONS.items():
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        sig = signals(buf.getvalue())
        ok = all(sig[m] for m in must)
        if not ok:
            failed.append((name, [m for m in must if not sig[m]]))
        rows.append((name, must, sig, ok))

    lines = [
        "# PLANS — physical-plan audit of the driver query surface\n",
        "Generated by `python tools/plan_audit.py` (initial AQE plan via",
        "`.explain('formatted')`, graded before execution). Signals:",
        "pushed = filters reach the parquet scan; pruned = ReadSchema covers only",
        "referenced columns; broadcast = dim joins are BroadcastHashJoin; topk =",
        "order+limit compiles to TakeOrderedAndProject; partial_agg = map-side",
        "combine; no_cartesian = no CartesianProduct node.\n",
        "| query | required | holds |",
        "| --- | --- | --- |",
    ]
    for name, must, sig, ok in rows:
        holds = ", ".join(k for k, v in sig.items() if v)
        lines.append(f"| {name} | {', '.join(must)} | {'✅ ' if ok else '❌ '}{holds} |")
    lines.append("")
    lines.append(
        "Notes: `knn_cosine_topk` / `range_join_price_bands` intentionally use\n"
        "BroadcastNestedLoopJoin — the non-scan side is tiny (3 query vectors /\n"
        "3 literal bands), which is the correct physical strategy; the guard is\n"
        "only that no unbounded CartesianProduct appears. The pipeline's dedup\n"
        "joins run on narrow (id, hash/flag) projections — document bodies never\n"
        "enter an exchange (operators/dedup.py docstrings).\n\n"
        "`embedding_neardup_pairs` and `ngram_jaccard_pairs` — the two r01\n"
        "scale-killers — are gated on no_nested_loop + equi_join: candidate\n"
        "generation must be an equi-join (LSH (table,bucket) self-join / PPJoin\n"
        "prefix-gram join), never an `id_a < id_b` theta join."
    )
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(out)
    print(out)
    if failed:
        print("FAILED:", failed)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Same-window A/B of the four r04-regressed bench queries (r04 VERDICT #6).

r04 measured scrub_pii_all 2.04×, qf_rule_metrics 1.41×,
asof_purchase_last_click 1.35× and multimodal_features 1.26× slower than
r03 — in a window whose own probes were materially worse (membw 3.5 vs
5.1 GB/s, cpu_scaling 0.544). This tool settles drift-vs-code in ONE
window, with the bench's own protocol (noop-write sink, alternating
rounds, median):

  1. re-times the four queries at sf0.1, median of N alternating rounds,
     next to fresh host probes — comparable against the r03/r04 records
     via the membw ratio;
  2. ATTRIBUTES the one code suspect: pii_hit_count's r04
     sequential-count change (commit 4ba8deb) is microbenchmarked in three
     formulations over the same sf0.1 text column —
       `independent`: the pre-4ba8deb per-pattern counts on RAW text (the
         superseded, double-counting semantics — replayed here ONLY for
         cost attribution, never shipped);
       `sequential`: the shipped progressive-scrub counts (correct, but
         every pattern re-scans partially-scrubbed text — regex work ~2×);
       `marker_diff`: counts markers ADDED by the scrub (occurrences of
         each replacement token in scrub output minus in input) — the same
         once-per-span semantics as `sequential` with one regex pass per
         pattern (the scrub itself) plus literal splits.
     Alternating order round-robin so a window hiccup hits all three.

Prints one JSON line; --write saves tools/ab_bench.json (BASELINE.md's
§Regression A/B quotes it).

Usage: python tools/ab_bench.py [sf_dir] [--rounds N] [--write]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

QUERIES_UNDER_TEST = (
    "scrub_pii_all",
    "qf_rule_metrics",
    "asof_purchase_last_click",
    "multimodal_features",
)
R03 = {"scrub_pii_all": 0.1798, "qf_rule_metrics": 0.6549,
       "asof_purchase_last_click": 0.2327, "multimodal_features": 0.7045}
R04 = {"scrub_pii_all": 0.3667, "qf_rule_metrics": 0.9233,
       "asof_purchase_last_click": 0.3148, "multimodal_features": 0.8847}


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write = "--write" in sys.argv
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from scaling_bench import copy_bandwidth, cpu_scaling
    from wikidataquality_spark.operators.scrub import (
        PII_PATTERNS,
        pii_hit_count,  # shipped = marker_diff since the r05 restructure
        scrub_column,
    )
    from wikidataquality_spark.plans.driver_queries import QUERIES
    from wikidataquality_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(cpus=cpus, app_name="ab_bench")

    def run_full(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm: JVM, parquet footers, python workers, media fixtures
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    QUERIES["multimodal_features"](spark, sf_dir).count()
    for name in QUERIES_UNDER_TEST:
        run_full(QUERIES[name](spark, sf_dir))
        spark.catalog.clearCache()

    host_membw = round(copy_bandwidth() / 1e9, 2)
    host_cpu = round(cpu_scaling(cpus), 3)

    # --- 1. the four queries, alternating rounds --------------------------
    samples: dict[str, list[float]] = {n: [] for n in QUERIES_UNDER_TEST}
    for _ in range(rounds):
        for name in QUERIES_UNDER_TEST:
            t0 = time.perf_counter()
            run_full(QUERIES[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    q_out = {
        name: {
            "median_s": round(_median(samples[name]), 4),
            "min_s": round(min(samples[name]), 4),
            "r03_s": R03[name],
            "r04_s": R04[name],
            "vs_r03": round(_median(samples[name]) / R03[name], 2),
            "vs_r04": round(_median(samples[name]) / R04[name], 2),
        }
        for name in QUERIES_UNDER_TEST
    }

    # --- 2. pii-count formulation attribution ----------------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def independent_counts() -> F.Column:
        col = F.col("text")
        total = F.lit(0)
        for _, pattern, _ in PII_PATTERNS:
            total = total + (F.size(F.split(col, pattern, -1)) - 1)
        return total

    def sequential_counts() -> F.Column:
        # the r04 formulation, inlined for attribution (pii_hit_count now
        # ships marker_diff)
        col = F.col("text")
        total = F.lit(0)
        for _, pattern, repl in PII_PATTERNS:
            total = total + (F.size(F.split(col, pattern, -1)) - 1)
            col = F.regexp_replace(col, pattern, repl)
        return total

    variants = {
        "independent": independent_counts,
        "sequential": sequential_counts,
        "marker_diff": lambda: pii_hit_count("text"),
    }
    for fn in variants.values():  # warm each plan once
        run_full(docs.select("doc_id", fn().alias("n")))
    v_samples: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(rounds):
        for vname, fn in variants.items():
            t0 = time.perf_counter()
            run_full(docs.select("doc_id", fn().alias("n")))
            v_samples[vname].append(time.perf_counter() - t0)
    # semantics check rides along: sequential == marker_diff on the corpus
    a = docs.select("doc_id", variants["sequential"]().alias("n"))
    b = docs.select("doc_id", variants["marker_diff"]().alias("n"))
    mismatch = (
        a.join(b.withColumnRenamed("n", "m"), "doc_id")
        .filter(F.col("n") != F.col("m"))
        .count()
    )
    v_out = {v: round(_median(s), 4) for v, s in v_samples.items()}
    v_out["sequential_vs_independent"] = round(
        _median(v_samples["sequential"]) / _median(v_samples["independent"]), 2
    )
    v_out["marker_diff_vs_independent"] = round(
        _median(v_samples["marker_diff"]) / _median(v_samples["independent"]), 2
    )
    v_out["marker_diff_equals_sequential_rows"] = int(mismatch) == 0

    out = {
        "metric": "regression_ab",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "cpus": cpus,
        "host_membw_gbps": host_membw,
        "host_cpu_scaling": host_cpu,
        "r03_membw_gbps": 5.1,
        "r04_membw_gbps": 3.5,
        "queries": q_out,
        "pii_count_variants": v_out,
    }
    print(json.dumps(out))
    if write:
        with open(os.path.join(REPO, "tools", "ab_bench.json"), "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

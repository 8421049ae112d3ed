"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall time over the headline set. Per-query seconds in "queries".
Also reports docs/sec for the flagship quality-filter pipeline (the BASELINE.md
throughput row) under "docs_per_sec", and "host_membw_gbps" — a 3s single-
stream memory-copy probe taken just before the timed queries. This sandbox
host's capacity drifts severalfold over minutes (identical code measured
20.6s and 43.2s headlines an hour apart); the probe timestamps which host
window a bench number was taken in (healthy ≈ 3.5-4.5 GB/s, collapsed < 2).
"host_cpu_scaling" is the second window axis: t_1/t_N for a fixed pure-CPU
work item run alone vs N-way concurrent (1.0 = all advertised vCPUs real;
this VM has measured ~0.55-0.6, i.e. ~19 effective cores behind local[32],
with per-query swings of 3× in the same bench run). Read BENCH deltas
against BOTH probes before attributing them to code.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wikidataquality_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "qf_keep_decision",
    "qf_rule_metrics",
    "dedup_exact",
    "minhash_neardup_docs",
    "simhash_neardup_docs",
    "scrub_pii_all",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "window_topk_orders_per_customer",
    "quality_score_docs",
    "asof_purchase_last_click",
    "dup_span_stats_docs",
    "ivf_ann_topk",
    "semdedup_marks",
    "grouped_map_source_zscore",
    # round-2 scale paths: equi-join pair similarity + crosscheck + multimodal
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "crosscheck_docs_vs_golden",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(cpus=cpus, app_name="bench")

    from wikidataquality_spark.plans.driver_queries import QUERIES

    # warm the JVM + parquet footers + python UDF workers once (excluded from
    # timings — worker spawn/numpy import is session overhead, not query cost)
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    QUERIES["minhash_neardup_docs"](spark, sf_dir).count()
    # first multimodal call builds the per-session media-fixture parquet
    # (operators/multimodal.py synthetic_media/ref_media) — one-time session
    # overhead like worker spawn, excluded the same way
    QUERIES["multimodal_features"](spark, sf_dir).count()

    # host-window probe (see module docstring): one 3s memory-copy stream —
    # the same code path as the scaling protocol's per-pair ceilings, so the
    # two numbers stay comparable in BASELINE.md
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from scaling_bench import copy_bandwidth, cpu_scaling

    host_membw = round(copy_bandwidth() / 1e9, 2)
    host_cpu = round(cpu_scaling(cpus), 3)

    # noop-format write, NOT .count(): counting lets Catalyst prune every
    # column the count doesn't need, so map-only queries (qf_keep_decision,
    # scrub_pii_all) timed as bare parquet scans — measured 0.40s pruned vs
    # 2.54s with the computed columns forced, a ~6× flattery (r04 review).
    # The noop sink consumes EVERY output column of the exact result the
    # driver would collect, so timings cover the advertised work. Protocol
    # field below marks the change — pre-v2 BENCH_r*.json headline/docs_per_sec
    # numbers are NOT comparable for the map-only queries.
    def run_full(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # v3: per-query MEDIAN of three runs — the estimator docs_per_sec already
    # uses. This VM stalls in 10-50s bursts (the same query measured 11.7s
    # and 3.0s back-to-back in one session, 2026-08-19); a single-shot
    # number grades the luck of one window, the median grades the typical
    # one. The first run doubles as the cold sample: if the host is steady
    # the median equals steady-state, if it hiccups once the median rejects
    # the outlier either way.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_full(QUERIES[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
            # drop any intra-query persisted stages so runs are timed
            # independently (no cross-query cache pollution or memory pressure)
            spark.catalog.clearCache()
        timings[name] = round(sorted(runs)[1], 4)

    # flagship docs/sec: full validation DAG over documents. Warm once
    # (python workers + model load are session overhead), then take the
    # MEDIAN of three timed runs — steady-state throughput is what scales to
    # a cluster, and single-run numbers on this host land anywhere between
    # first-warm (~5k docs/s) and converged (~8k): worker JIT takes >1 prior
    # run and host windows hiccup, the same variance the scaling protocol's
    # order-flipped rounds cancel. Median, not min: min would grade the
    # luckiest host window, median grades the typical one.
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    run_full(QUERIES["qf_keep_decision"](spark, sf_dir))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_full(QUERIES["qf_keep_decision"](spark, sf_dir))
        runs.append(time.perf_counter() - t0)
    qf_sec = sorted(runs)[1]
    docs_per_sec = round(n_docs / qf_sec, 2) if qf_sec > 0 else None

    total = round(sum(timings.values()), 4)
    # only a trailing sf<digits> segment is a scale factor; any other dir
    # name must not leak path garbage into the numeric-ish sf field
    m = re.search(r"sf([0-9.]+)$", sf_dir.rstrip("/"))
    sf = m.group(1) if m else os.path.basename(sf_dir.rstrip("/"))
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "cpus": cpus,
                "host_membw_gbps": host_membw,
                "host_cpu_scaling": host_cpu,
                "bench_protocol": "noop-write-v3-median3",
            }
        )
    )


if __name__ == "__main__":
    main()

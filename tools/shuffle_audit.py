"""Measured shuffle volumes per headline query — the quantitative twin of
the plan-shape gates in PLANS.md.

The plan audit proves the SHAPE is right (no cartesian, pushed filters,
broadcast dims); this tool measures what actually moved: per-query input
bytes, shuffle write/read bytes, and shuffle records, from Spark's own task
metrics. Bytes are deterministic per code+data version (unlike seconds on
this drifting host), so regressions show as exact deltas — a query whose
shuffle write jumps from 3 MB to 300 MB broke its narrow-projection
contract no matter what the wall clock says. Two headline metrics, both
compression-free and host-free:
  - rows_shuffled_per_input_row — row expansion through every exchange of
    the DAG (banding ops expand by design: 16 band rows/doc for MinHash;
    what matters is the factor is the DESIGNED one, not N²);
  - avg_shuffled_row_bytes — the width of what actually moved. The narrow-
    shuffle contract ("doc bodies/blobs never shuffle") is ~12-25 B rows;
    a width jump to hundreds of bytes means a fat column leaked into an
    exchange.

Protocol: fresh SparkSession with event logging on; each headline query
runs once UNGROUPED (warm-up: parquet footers, python workers, train-once
artifact caches) and once inside a named job group, materialized through
the same noop-format write as bench.py; the event log is parsed after
spark.stop() — job-group id → stage ids → summed task metrics.

    python tools/shuffle_audit.py [sf_dir] [--write]

--write persists tools/shuffle_audit.json, which tools/plan_audit.py
renders into PLANS.md on its next run.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)


def run_queries(sf_dir: str) -> str:
    """Run the bench headline set under job groups with event logging on;
    return the event-log directory."""
    from pyspark.sql import SparkSession

    assert SparkSession.getActiveSession() is None, (
        "shuffle_audit needs to OWN the session (event logging is a "
        "start-time config) — run it standalone"
    )
    from bench import HEADLINE
    from wikidataquality_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="wdq_eventlog_")
    spark = get_spark(
        app_name="shuffle_audit",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # plain-text JSON lines (default zstd needs a codec python lacks)
            "spark.eventLog.compress": "false",
        },
    )
    from wikidataquality_spark.plans.driver_queries import QUERIES

    sc = spark.sparkContext
    for name in HEADLINE:
        # warm-up pass, ungrouped: excludes one-time session costs (python
        # worker spawn, fixture/artifact builds) from the measured group —
        # the same exclusion bench.py applies to its timings
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        # drop session-level memory caches so the measured run's Input
        # Metrics reflect the real scan (warm-up persists would otherwise
        # absorb every read and inflate amplification denominators); disk
        # artifacts (fixture parquet, train-once models) stay warm
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobGroup(None, None)
    spark.stop()
    return log_dir


def parse_event_log(log_dir: str) -> dict[str, dict]:
    """Event-log JSON → per-job-group summed task metrics."""
    stage_group: dict[int, str] = {}
    agg: dict[str, dict] = {}

    def bucket(group: str) -> dict:
        return agg.setdefault(
            group,
            {
                "input_bytes": 0,
                "input_records": 0,
                "shuffle_write_bytes": 0,
                "shuffle_read_bytes": 0,
                "shuffle_write_records": 0,
                "n_tasks": 0,
            },
        )

    # Spark 4 writes an eventlog_v2_* DIRECTORY (rolling files + appstatus
    # marker) per app — walk every regular file under the log dir
    paths = [
        os.path.join(root, name)
        for root, _dirs, files in os.walk(log_dir)
        for name in files
        if not name.startswith("appstatus")
    ]

    def events():
        for path in sorted(paths):
            with open(path) as f:
                for line in f:
                    try:
                        yield json.loads(line)
                    except json.JSONDecodeError:
                        continue

    # TWO passes: all JobStarts populate stage_group before any TaskEnd is
    # attributed. Rolling logs split at arbitrary points and lexicographic
    # file order misorders events_10_ before events_2_ — a single ordered
    # pass would drop (or misattribute) every task whose JobStart lives in
    # a later-sorted file (r04 session review).
    for e in events():
        if e.get("Event") == "SparkListenerJobStart":
            group = (e.get("Properties") or {}).get("spark.jobGroup.id")
            if group:
                for si in e.get("Stage Infos", []):
                    # first-listed group wins; only a stage REUSED across
                    # two grouped jobs is ambiguous, and each query here
                    # builds a fresh plan, so reuse doesn't arise
                    stage_group.setdefault(si["Stage ID"], group)
    for e in events():
        if e.get("Event") != "SparkListenerTaskEnd":
            continue
        group = stage_group.get(e.get("Stage ID"))
        tm = e.get("Task Metrics")
        if group is None or tm is None:
            continue
        b = bucket(group)
        b["n_tasks"] += 1
        im = tm.get("Input Metrics") or {}
        b["input_bytes"] += im.get("Bytes Read", 0)
        b["input_records"] += im.get("Records Read", 0)
        sw = tm.get("Shuffle Write Metrics") or {}
        b["shuffle_write_bytes"] += sw.get("Shuffle Bytes Written", 0)
        b["shuffle_write_records"] += sw.get("Shuffle Records Written", 0)
        sr = tm.get("Shuffle Read Metrics") or {}
        b["shuffle_read_bytes"] += sr.get("Remote Bytes Read", 0) + sr.get(
            "Local Bytes Read", 0
        )
    return agg


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    write = False
    for a in sys.argv[1:]:
        if a == "--write":
            write = True
        else:
            sf_dir = a
    log_dir = run_queries(sf_dir)
    agg = parse_event_log(log_dir)

    from bench import HEADLINE

    out = {"sf_dir": sf_dir, "queries": {}}
    for name in HEADLINE:
        b = agg.get(name)
        if b is None:
            out["queries"][name] = {"error": "no tasks attributed"}
            continue
        swb, swr = b["shuffle_write_bytes"], b["shuffle_write_records"]
        out["queries"][name] = {
            "input_mb": round(b["input_bytes"] / 1e6, 3),
            "input_records": b["input_records"],
            "shuffle_write_mb": round(swb / 1e6, 3),
            "shuffle_read_mb": round(b["shuffle_read_bytes"] / 1e6, 3),
            "shuffle_write_records": swr,
            # the two scale metrics (compression-free, host-free):
            # row expansion through every exchange of the DAG, and the
            # average width of what actually moved (narrow-shuffle proof)
            "rows_shuffled_per_input_row": round(swr / b["input_records"], 3)
            if b["input_records"]
            else None,
            "avg_shuffled_row_bytes": round(swb / swr, 1) if swr else None,
            "n_tasks": b["n_tasks"],
        }
    print(json.dumps(out, indent=1))
    if write:
        dst = os.path.join(REPO, "tools", "shuffle_audit.json")
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {dst} — run tools/plan_audit.py to render PLANS.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

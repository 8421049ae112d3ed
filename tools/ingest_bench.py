"""WARC-vs-parquet ingest throughput — what the crawl-container seam costs.

Same corpus, same full validation DAG (tools/run_pipeline.py), fed once as
the canonical 32-file parquet dataset and once as 32 per-record-gzip
`.warc.gz` segments built from the identical rows (io/warc.py encode). The
delta is the price of parsing the crawl container in-line: gzip member
decompression + WARC/HTTP framing + recrawl URL dedup, all of which a
pre-converted corpus has already paid. Protocol mirrors the bench family:
one untimed warm-up per arm (JVM/codegen/python workers), then timed runs
in alternating order, medians reported; host window stamped with the same
memory-bandwidth probe as scaling_bench/bench.py.

    python tools/ingest_bench.py [n_pages] [--rounds N] [--write]

--write replaces BASELINE.md's "## Measured (ingest path)" section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)


N_SEGMENTS = 32  # pinned: parse parallelism = segment count for the warc arm


def build_warc_corpus(parquet_dir: str, n_pages: int) -> str:
    """Exactly N_SEGMENTS .warc.gz segments, cached like the parquet corpus
    (same per-uid lock-published discipline). An explicit repartition pins
    the count — the parquet SCAN bin-packs small files by maxPartitionBytes,
    so "one segment per scan partition" would be host/conf-dependent (r04
    session review). Segments stream to disk one at a time
    (toLocalIterator), so driver memory holds one blob, not the corpus."""
    from wikidataquality_spark.datagen import DATAGEN_VERSION
    from wikidataquality_spark.io.locking import publish_dir, user_cache_root
    from wikidataquality_spark.io.warc import encode_warc_partitions
    from wikidataquality_spark.session import get_spark

    root = user_cache_root("wdq_scaling")
    path = os.path.join(root, f"warc_{n_pages}_42_s{N_SEGMENTS}_v{DATAGEN_VERSION}")

    def write(staging: str) -> None:
        spark = get_spark(app_name="warc_corpus_build")
        blobs = encode_warc_partitions(
            spark.read.parquet(parquet_dir).repartition(N_SEGMENTS)
        ).toLocalIterator()
        os.makedirs(staging, exist_ok=True)
        for i, row in enumerate(blobs):
            with open(os.path.join(staging, f"seg-{i:05d}.warc.gz"), "wb") as f:
                f.write(bytes(row["warc_blob"]))

    return publish_dir(path, write)


def timed_run(run_pipeline, argv: list[str]) -> float:
    from io import StringIO

    buf, old = StringIO(), sys.stdout
    sys.stdout = buf
    t0 = time.perf_counter()
    try:
        rc = run_pipeline.main(argv)
    finally:
        sys.stdout = old
    assert rc == 0, buf.getvalue()
    return time.perf_counter() - t0


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("n_pages", nargs="?", type=int, default=50000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--write", action="store_true")
    ns = ap.parse_args()
    n_pages, rounds, write = ns.n_pages, ns.rounds, ns.write

    import run_pipeline
    from scaling_bench import copy_bandwidth, gen_corpus, replace_section

    pq = gen_corpus(n_pages)
    wc = build_warc_corpus(pq, n_pages)
    membw = round(copy_bandwidth() / 1e9, 2)

    scratch = tempfile.mkdtemp(prefix="wdq_ingest_bench_")
    times: dict[str, list[float]] = {"parquet": [], "warc": []}

    def run(arm: str, tag: str) -> float:
        out = os.path.join(scratch, f"{arm}_{tag}")
        argv = ["--input", pq if arm == "parquet" else wc,
                "--output", out, "--metrics", out + "_m"]
        if arm == "warc":
            argv += ["--input-format", "warc"]
        return timed_run(run_pipeline, argv)

    # Parallelism parity (io/warc.py docstring): binaryFile PACKS files up
    # to maxPartitionBytes per input partition, so this corpus's 32 tiny
    # test segments would all land in ONE task and the parse would run
    # serially — an artifact of miniature segments, not of the format.
    # Production Common Crawl segments (~1 GB ≫ 128 MB) each get their own
    # task at the default. Sizing the knob to the test segments makes the
    # measured overhead the REPRESENTATIVE per-byte framing cost.
    from wikidataquality_spark.session import get_spark

    spark = get_spark(app_name="ingest_bench")
    default_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        run("parquet", "warm")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        run("warc", "warm")
        spark.conf.set("spark.sql.files.maxPartitionBytes", default_mpb)
        for r in range(rounds):
            order = ("parquet", "warc") if r % 2 == 0 else ("warc", "parquet")
            for arm in order:
                if arm == "warc":
                    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
                times[arm].append(run(arm, f"r{r}"))
                spark.conf.set("spark.sql.files.maxPartitionBytes", default_mpb)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", default_mpb)
        shutil.rmtree(scratch, ignore_errors=True)

    import statistics

    med = {k: statistics.median(v) for k, v in times.items()}
    result = {
        "n_pages": n_pages,
        "rounds": rounds,
        "parquet_sec": round(med["parquet"], 2),
        "warc_sec": round(med["warc"], 2),
        "parquet_docs_per_sec": round(n_pages / med["parquet"], 1),
        "warc_docs_per_sec": round(n_pages / med["warc"], 1),
        "warc_overhead_x": round(med["warc"] / med["parquet"], 3),
        "host_membw_gbps": membw,
        "per_round": {k: [round(x, 2) for x in v] for k, v in times.items()},
    }
    print(json.dumps(result))
    if write:
        section = (
            "## Measured (ingest path)\n\n"
            f"Same {n_pages}-page corpus through the identical full DAG "
            f"(tools/run_pipeline.py), fed as 32-file parquet vs {N_SEGMENTS} "
            "per-record-gzip .warc.gz segments (io/warc.py). Medians of "
            f"{rounds} alternating timed runs after one warm-up per arm, "
            f"in a {membw} GB/s memory-bandwidth window:\n\n"
            "| arm | wall sec | docs/sec |\n| --- | --- | --- |\n"
            f"| parquet | {result['parquet_sec']} | {result['parquet_docs_per_sec']} |\n"
            f"| warc.gz | {result['warc_sec']} | {result['warc_docs_per_sec']} |\n\n"
            f"WARC overhead ×{result['warc_overhead_x']} — the in-line price "
            "of gzip member decompression + WARC/HTTP framing + recrawl URL "
            "dedup, which a pre-converted corpus has already paid once at "
            "conversion time. Per-round seconds: "
            f"{result['per_round']}.\n\n"
        )
        bl = os.path.join(REPO, "BASELINE.md")
        with open(bl) as f:
            content = f.read()
        with open(bl, "w") as f:
            f.write(replace_section(content, "## Measured (ingest path)", section))
        print(f"wrote {bl} §Measured (ingest path)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Generate + freeze the golden fixtures (run once per intentional semantic change).

Golden provenance (documented openly, SURVEY.md §7 "What's hard" #2): the
reference labels ARE the output of this pipeline version at the frozen corpus
(seed=42, n=800). The F1≥0.99 gate (BASELINE.json:2) therefore checks
*stability* — that refactors, partitioning changes, and Spark upgrades never
change a single keep/drop decision or scrubbed byte. Planted-defect spot
checks in tests/test_pipeline.py independently verify the labels are *right*,
not merely reproducible.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidataquality_spark.datagen import write_pages_parquet  # noqa: E402
from wikidataquality_spark.pipeline import results, validate  # noqa: E402
from wikidataquality_spark.session import get_spark  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")
GOLDEN_N = 800
GOLDEN_SEED = 42


def pages_path(tmp: str = "/tmp/wdq_pages_fixture") -> str:
    return write_pages_parquet(os.path.join(tmp, f"pages_{GOLDEN_N}_{GOLDEN_SEED}.parquet"), GOLDEN_N, GOLDEN_SEED)


def main() -> None:
    spark = get_spark(cpus=8)
    pages = spark.read.parquet(pages_path())
    r = results(validate(pages)).select(
        "url", "keep", "violated_rules", "scrubbed_text", "lang_pred"
    )
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    out = os.path.join(FIXTURE_DIR, "golden_labels.parquet")
    r.coalesce(1).toPandas().to_parquet(out, index=False)
    kept = r.filter("keep").count()
    print(f"golden frozen: {out} ({r.count()} rows, {kept} kept)")


if __name__ == "__main__":
    main()

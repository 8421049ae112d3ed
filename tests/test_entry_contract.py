"""Driver-contract smoke: entry() returns rows with a stable schema; every
queries() entry runs at sf0.001 and every oracle key exists in queries()."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"doc_id", "keep", "violated_rules"} <= cols


def test_queries_all_run_sf0001(spark, sf0001_dir):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf0001_dir)
        assert df.count() >= 0, name


def test_query_surface_is_driver_sized():
    """The r01 driver evaluated exactly the first 50 registered queries —
    the surface must stay ≤50 so every operator gets a CORRECTNESS row, and
    ≤2 entries may lack an oracle twin (engine-specific sketches only)."""
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert 20 <= len(qs) <= 50
    rows_only = set(qs) - set(os_)
    assert rows_only <= {"approx_sketches"}, rows_only


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)

"""pii_hit_count marker-diff gates (r04 VERDICT #6 restructure). The scrub
chain's own property gates live in tests/test_properties.py (idempotence)
and tests/test_heuristics.py (the once-per-span overlapping-pattern pins);
this module covers the marker-diff formulation's specific edge set."""

from __future__ import annotations


def test_pii_hit_count_marker_diff_edges(spark):
    """Pre-existing markers in the INPUT cancel in the subtraction; freshly
    scrubbed spans count exactly once each; NULL counts 0."""
    from pyspark.sql import functions as F  # noqa: F401

    from wikidataquality_spark.operators.scrub import pii_hit_count

    rows = [
        ("already has <EMAIL> and <IP> markers", 0),      # nothing scrubbed
        ("write to bob@example.com or <EMAIL>", 1),       # 1 added, 1 pre-existing
        ("a@b.io c@d.io 10.0.0.1", 3),
        (None, 0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r["n"] for r in df.select(pii_hit_count("text").alias("n")).collect()]
    assert got == [n for _, n in rows]

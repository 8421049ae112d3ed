"""Deterministic stratified sampling: reproducibility under repartitioning,
nested samples across rates, seed independence, rate tolerance, NULL policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.sampling import (
    sample_unit,
    stratified_sample_marks,
)


@pytest.fixture(scope="module")
def docs(spark, sf0001_dir):
    return spark.read.parquet(f"{sf0001_dir}/documents.parquet").select(
        "doc_id", "source"
    )


def _kept(df, rates, **kw):
    out = stratified_sample_marks(df, rates, **kw)
    return {r["doc_id"] for r in out.filter("sampled").collect()}


def test_deterministic_across_runs_and_partitionings(spark, docs):
    rates = {"src1": 0.5, "src2": 0.2}
    a = _kept(docs, rates)
    b = _kept(docs.repartition(7, "source"), rates)
    c = _kept(docs.coalesce(1), rates)
    assert a == b == c and len(a) > 0


def test_nested_samples_across_rates(docs):
    lo = _kept(docs, {}, default_rate=0.1)
    hi = _kept(docs, {}, default_rate=0.3)
    assert lo < hi  # strict subset: same u, higher threshold


def test_seed_independence(docs):
    a = _kept(docs, {}, default_rate=0.3, seed=0)
    b = _kept(docs, {}, default_rate=0.3, seed=1)
    assert a != b
    # overlap ≈ 0.3 * |a| for independent draws, not ≈ |a|
    assert len(a & b) < 0.6 * len(a)


def test_per_stratum_rates_within_tolerance(spark):
    # 5k ids per stratum: binomial sigma ~ 0.4-0.6%, so ±3% is a >5-sigma gate
    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    out = stratified_sample_marks(df, {"s0": 0.8, "s1": 0.25}, default_rate=0.1)
    got = {
        r["source"]: (r["kept"], r["total"])
        for r in out.groupBy("source")
        .agg(
            F.count(F.when(F.col("sampled"), 1)).alias("kept"),
            F.count("*").alias("total"),
        )
        .collect()
    }
    want = {"s0": 0.8, "s1": 0.25, "s2": 0.1, "s3": 0.1}
    for src, (k, t) in got.items():
        assert k / t == pytest.approx(want[src], abs=0.03), src


def test_null_id_and_null_stratum_policy(spark):
    rows = [(1, "news"), (2, None), (None, "news")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {
        (r["doc_id"]): r
        for r in stratified_sample_marks(
            df, {"news": 1.0}, default_rate=1.0
        ).collect()
    }
    assert out[1]["sampled"] is True
    assert out[2]["sampled"] is True  # NULL stratum -> default rate
    assert out[None]["sampled"] is False  # NULL id never sampled
    assert out[None]["sample_u"] is None


def test_rate_validation():
    import pandas as pd  # noqa: F401

    with pytest.raises(ValueError, match="must be in"):
        stratified_sample_marks(None, {"news": 1.5})


def test_sample_unit_uniformity(spark):
    """Mean of u over sequential ids ~ 0.5 and deciles roughly even — guards
    against a hash regression that correlates consecutive ids."""
    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    stats = df.select(
        F.avg(sample_unit("doc_id")).alias("mean"),
        F.avg((sample_unit("doc_id") * 10).cast("int")).alias("decile_mean"),
    ).first()
    assert stats["mean"] == pytest.approx(0.5, abs=0.02)
    assert stats["decile_mean"] == pytest.approx(4.5, abs=0.2)


def test_default_named_stratum_is_still_validated():
    """A stratum literally named 'default' must not dodge the range check
    by colliding with default_rate in a merged dict (r04 review)."""
    with pytest.raises(ValueError, match="must be in"):
        stratified_sample_marks(None, {"default": 1.5})
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample_marks(None, {}, default_rate=-0.1)


def test_temperature_rates_shapes():
    from wikidataquality_spark.operators.sampling import temperature_rates

    sizes = {"en": 1_000_000, "fr": 100_000, "sw": 1_000}
    # τ=1: natural proportions — the largest feasible T keeps everything
    r1 = temperature_rates(sizes, temperature=1.0)
    assert all(abs(v - 1.0) < 1e-9 for v in r1.values()), r1
    # τ→large: flattens toward uniform — the rare stratum is kept fully,
    # the head is down-sampled hardest
    r5 = temperature_rates(sizes, temperature=100.0)
    assert r5["sw"] == 1.0
    assert r5["en"] < r5["fr"] < 1.0
    # expected counts match the mixture shape: n_s·rate_s ∝ p_s
    picked = {s: sizes[s] * r5[s] for s in sizes}
    assert abs(picked["en"] / picked["sw"] - 1.0) < 0.1  # near-uniform
    # explicit FEASIBLE budget: total expected ≈ target, shape preserved
    r = temperature_rates(sizes, temperature=2.0, target_total=30_000)
    total = sum(sizes[s] * r[s] for s in sizes)
    assert abs(total - 30_000) < 1.0
    # INFEASIBLE budget (rate_sw would exceed 1): capped at t_max with the
    # shape preserved — the documented scale-down, not a silent upsample
    r_cap = temperature_rates(sizes, temperature=2.0, target_total=50_000)
    assert max(r_cap.values()) <= 1.0
    assert sum(sizes[s] * r_cap[s] for s in sizes) < 50_000
    # τ=2 mixture: p ∝ sqrt(n) — check the en:fr ratio
    import math

    want = math.sqrt(sizes["en"]) / math.sqrt(sizes["fr"])
    got = (sizes["en"] * r["en"]) / (sizes["fr"] * r["fr"])
    assert abs(got / want - 1.0) < 1e-9


def test_temperature_rates_edge_cases():
    import pytest as _pytest

    from wikidataquality_spark.operators.sampling import temperature_rates

    assert temperature_rates({}, 1.0) == {}
    assert temperature_rates({"a": 0}, 1.0) == {}
    with _pytest.raises(ValueError, match="temperature"):
        temperature_rates({"a": 10}, 0.0)
    # rates always land in [0,1] (valid stratified_sample_marks input)
    r = temperature_rates({"a": 5, "b": 500000}, temperature=0.3)
    assert all(0.0 <= v <= 1.0 for v in r.values())

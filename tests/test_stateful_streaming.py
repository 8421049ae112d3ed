"""applyInPandasWithState: state persists across micro-batches; batch twin agrees."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.streaming.stateful import running_user_stats
from wikidataquality_spark.streaming.windows import run_stream_to_memory


@pytest.fixture(scope="module")
def events_batch(spark, sf0001_dir):
    return spark.read.parquet(os.path.join(sf0001_dir, "events.parquet"))


def _final_per_user(df):
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def test_stateful_matches_batch_twin(spark, events_batch, sf0001_dir, tmp_path):
    # multi-file source → the stream really runs over >1 micro-batch when
    # maxFilesPerTrigger=1, so state must carry counts across batches
    src_dir = str(tmp_path / "events_split")
    events_batch.repartition(4).write.parquet(src_dir)
    schema = events_batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = run_stream_to_memory(spark, running_user_stats(stream), output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2), r["last_seen_us"])
        for r in _final_per_user(out).collect()
    }
    expected = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2), r["last_seen_us"])
        for r in running_user_stats(events_batch).collect()
    }
    assert got == expected
    # with maxFilesPerTrigger=1 over 4 files, some user must have been
    # updated more than once — proves cross-batch state, not one big batch
    n_updates = out.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert n_updates > 1


def test_batch_twin_schema(spark, events_batch):
    out = running_user_stats(events_batch)
    assert set(out.columns) == {"user_id", "n_events", "total_value", "last_seen_us"}


def test_stateful_with_idle_timeout_smoke(spark, events_batch, tmp_path):
    """ProcessingTimeTimeout mode: same totals as NoTimeout when no key goes
    idle long enough to evict (exercises the setTimeoutDuration path; the
    hasTimedOut eviction branch needs wall-clock idle gaps a bounded test
    can't produce deterministically)."""
    src_dir = str(tmp_path / "events_split_t")
    events_batch.repartition(2).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(events_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = run_stream_to_memory(
        spark, running_user_stats(stream, idle_timeout="10 minutes"), output_mode="update"
    )
    got = {r["user_id"]: r["n_events"] for r in _final_per_user(out).collect()}
    expected = {r["user_id"]: r["n_events"] for r in running_user_stats(events_batch).collect()}
    assert got == expected

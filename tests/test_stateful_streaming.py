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


def test_all_null_value_key_matches_batch_twin(spark):
    """A key whose `value`s are ALL NULL must stream total_value NULL, not
    0.0 — the batch twin is F.sum(value), which returns NULL for such keys
    (r04 review: the 0.0 init broke parity exactly the way the old
    last_seen_us epoch-0 init did)."""
    import pandas as pd

    from wikidataquality_spark.streaming.stateful import _update_user_stats

    class FakeState:
        def __init__(self):
            self._v, self.hasTimedOut = None, False

        exists = property(lambda s: s._v is not None)
        get = property(lambda s: s._v)

        def update(self, v):
            self._v = v

    st = FakeState()
    pdf = pd.DataFrame(
        {"value": pd.array([None, None], dtype="float64"),
         "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])}
    )
    [row] = list(_update_user_stats((7,), iter([pdf]), st))
    assert row.iloc[0]["n_events"] == 2
    assert row.iloc[0]["total_value"] is None

    # a later batch WITH values starts the sum from those values, not 0+them
    pdf2 = pd.DataFrame(
        {"value": [1.5, None], "ts": pd.to_datetime(["2024-01-03"] * 2)}
    )
    [row2] = list(_update_user_stats((7,), iter([pdf2]), st))
    assert row2.iloc[0]["total_value"] == 1.5

    # and the batch twin returns NULL for an all-NULL key — same contract
    batch = spark.createDataFrame(
        [(7, None, "2024-01-01 00:00:00")], "user_id long, value double, ts string"
    )
    [b] = running_user_stats(batch).collect()
    assert b["total_value"] is None


def test_idle_timeout_eviction_logic():
    """The eviction path of the stateful update fn, driven with a fake
    GroupState — a real stream with ProcessingTimeTimeout keeps scheduling
    timeout-check micro-batches, which livelocks processAllAvailable on a
    bounded source, so the branch is unit-tested python-side."""
    import pandas as pd

    from wikidataquality_spark.streaming.stateful import (
        _duration_ms,
        _make_timeout_update,
        _update_user_stats,
    )

    assert _duration_ms("10 minutes") == 600_000
    assert _duration_ms("1 second") == 1000

    class FakeState:
        def __init__(self, value=None, timed_out=False):
            self._v, self.hasTimedOut = value, timed_out
            self.removed, self.timeout_ms = False, None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v, self.removed = None, True

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    # timed-out key: emits its final snapshot once, then state is removed
    st = FakeState(value=(5, 42.0, 123), timed_out=True)
    [snap] = list(_update_user_stats((7,), iter([]), st))
    assert st.removed and snap.iloc[0]["n_events"] == 5

    # live key through the timeout wrapper: accumulates AND re-arms timeout
    pdf = pd.DataFrame({"value": [1.0, 2.0], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    st2 = FakeState()
    update = _make_timeout_update("10 minutes")
    [row] = list(update((7,), iter([pdf]), st2))
    assert row.iloc[0]["n_events"] == 2
    assert st2.timeout_ms == 600_000


def test_duration_parser_units_and_errors():
    """'1 day' works; unknown shapes fail naming the supported vocabulary
    instead of a bare KeyError (r04 review)."""
    import pytest

    from wikidataquality_spark.streaming.stateful import _duration_ms

    assert _duration_ms("1 day") == 86_400_000
    assert _duration_ms("500 milliseconds") == 500
    assert _duration_ms("2 weeks") == 2 * 604_800_000
    with pytest.raises(ValueError, match="unit one of"):
        _duration_ms("90 fortnights")
    with pytest.raises(ValueError, match="unit one of"):
        _duration_ms("1 hour 30 minutes")
    with pytest.raises(ValueError, match="positive"):
        _duration_ms("0 seconds")


def test_running_user_stats_rejects_non_utc_session(spark):
    """The stateful UDF reads session-tz-naive Arrow timestamps as epoch
    micros — valid ONLY under UTC. A foreign session tz must fail loudly,
    not silently shift last_seen_us away from the batch twin (r04 review)."""
    import pytest

    from wikidataquality_spark.streaming.stateful import running_user_stats

    df = spark.createDataFrame([(1, "2025-01-01 00:00:00", 1.0)],
                               "user_id long, ts string, value double")
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        with pytest.raises(ValueError, match="timeZone='UTC'"):
            running_user_stats(df)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert running_user_stats(df).count() == 1  # UTC restored -> fine

"""Custom stateful streaming operators via applyInPandasWithState.

Parity: the reference re-checks entities incrementally as edits arrive
(ref≈includes/EvaluateConstraintReportJob.php:~15-80 — one job per touched
entity, violation counts accumulated in SQL tables). The Spark-native
recast keeps per-key accumulators in the state store: counts survive across
micro-batches exactly-once, and the opt-in idle_timeout (ProcessingTime
eviction with a final-snapshot emit) bounds state by ACTIVE keys, not keys
ever seen (the 10^12-doc concern). Default is NoTimeout — exact running
totals, the oracle-checked mode.

`running_user_stats` is the flagship: per-user event count + value sum +
last-seen timestamp, updated per micro-batch, emitted on every update.
Batch-mode fallback (groupBy.agg) gives the DuckDB-checkable twin.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_seen_us", T.LongType(), True),
    ]
)

USER_STATS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_seen_us", T.LongType(), True),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle-key eviction (ProcessingTimeTimeout mode): emit the final
        # snapshot once, then drop the state entry — bounded state
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total, "last_seen_us": last}]
        )
        return
    if state.exists:
        n, total, last = state.get
    else:
        # total and last start as None (emit NULL), NOT 0: the batch twins
        # are F.sum(value) / F.max(unix_micros(ts)), which ignore NULLs and
        # return NULL when a key has no valid value — a 0 init would emit
        # 0.0/epoch-0 for all-NULL keys (and the max() clamp would mask
        # pre-1970 timestamps), breaking the advertised streamed == batch
        # parity (r04 review: total_value had exactly this bug while the
        # adjacent comment fixed it for last_seen_us only)
        n, total, last = 0, None, None
    for pdf in pdfs:
        n += len(pdf)
        # dropna mirrors F.sum's NULL-skipping. Caveat, documented: Arrow
        # hands NULL and genuine NaN to pandas as the same NaN in a float
        # column, so a true NaN value (which F.sum would propagate) is
        # indistinguishable here and is skipped like a NULL
        vals = pdf["value"].dropna()
        if len(vals):
            batch_sum = float(vals.sum())
            total = batch_sum if total is None else total + batch_sum
        ts = pdf["ts"].dropna()
        if len(ts):
            # datetime64[any-unit] → µs explicitly (pandas 2 may hand ns or µs)
            ts_us = int(ts.to_numpy().astype("datetime64[us]").astype("int64").max())
            last = ts_us if last is None else max(last, ts_us)
    state.update((n, total, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total, "last_seen_us": last}]
    )


def running_user_stats(events: DataFrame, idle_timeout: str | None = None) -> DataFrame:
    """Streaming: per-user running (count, sum(value), last ts) via the state
    store. Batch DataFrame input falls back to the equivalent groupBy.agg —
    same output schema, so the oracle check runs against the batch twin.

    idle_timeout (e.g. '30 minutes') enables ProcessingTimeTimeout eviction:
    keys quiet for that long emit a final snapshot and leave the store, so
    state is bounded by ACTIVE keys, not all keys ever seen. Default None =
    NoTimeout (exact running totals forever — the oracle-checked mode).

    CAUTION: use idle_timeout only on genuinely unbounded streams. With
    ProcessingTimeTimeout the engine schedules timeout-check micro-batches
    indefinitely, so driving a BOUNDED source with processAllAvailable()
    livelocks (tests exercise the eviction branch python-side instead)."""
    # UTC session precondition, checked loudly: Arrow hands the pandas-side
    # UDF timestamps CONVERTED to spark.sql.session.timeZone as tz-naive
    # values, and _update_user_stats reads them as epoch micros — true only
    # when the session tz is UTC (session.py pins it; a foreign session with
    # e.g. America/Los_Angeles would silently emit last_seen_us shifted by
    # the UTC offset while the batch twin's unix_micros stays correct —
    # r04 review).
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"running_user_stats requires spark.sql.session.timeZone='UTC' "
            f"(got {tz!r}): the stateful UDF reads session-tz-naive Arrow "
            "timestamps as epoch micros, which diverges from the batch twin "
            "under any other zone"
        )
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if not src.isStreaming:
        return src.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("double")).alias("total_value"),
            F.max(F.unix_micros("ts")).alias("last_seen_us"),
        )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    fn = _update_user_stats if not idle_timeout else _make_timeout_update(idle_timeout)
    return (
        src.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=USER_STATS_OUTPUT,
            stateStructType=USER_STATS_STATE,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


_DURATION_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
    "week": 604_800_000, "weeks": 604_800_000,
}


def _duration_ms(spec: str) -> int:
    """'10 minutes' → 600000 (setTimeoutDuration takes int milliseconds).
    Single '<qty> <unit>' specs only; unknown shapes fail with the supported
    vocabulary spelled out instead of a bare KeyError (r04 review)."""
    parts = spec.split()
    if len(parts) != 2 or parts[1] not in _DURATION_MS or not parts[0].lstrip("-").isdigit():
        raise ValueError(
            f"duration {spec!r} not understood: expected '<int> <unit>' with "
            f"unit one of {sorted(set(_DURATION_MS))}"
        )
    qty = int(parts[0])
    if qty <= 0:
        raise ValueError(f"duration {spec!r} must be positive")
    return qty * _DURATION_MS[parts[1]]


def _make_timeout_update(idle_timeout: str):
    ms = _duration_ms(idle_timeout)

    def update(key, pdfs, state: GroupState):
        yield from _update_user_stats(key, pdfs, state)
        if state.exists:
            state.setTimeoutDuration(ms)

    return update

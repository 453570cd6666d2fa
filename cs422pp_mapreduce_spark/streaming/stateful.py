"""Custom stateful streaming operator via applyInPandasWithState.

Spark's built-in windows cover time-bucketed aggregation; anything with
bespoke per-key state (running counters with custom expiry, cross-event
derived state, online anomaly scores) needs the arbitrary-state API.
This module implements a per-user *running activity profile*:

    state per user: (n_events, sum_value, max_value, last_ts)
    emitted per micro-batch and user: the updated profile row

By default profiles never expire (``NoTimeout``) — correct when the key
cardinality is bounded (users), and what the batch-equivalence test
asserts. For unbounded key spaces, pass ``ttl_minutes`` to expire idle
keys: ProcessingTimeTimeout (wall-clock idle) by default, or
EventTimeTimeout (``event_time=True``; watermark-driven — the flavor a
replayed backfill needs, since expiry is then a function of the data,
not of replay speed). Either way the idle key's state is removed when
the timeout fires, so state stays bounded on an unbounded stream.

The state is a tuple of scalars per key: memory is O(active users),
shuffles are one hash exchange on user_id per micro-batch — the same
cost profile as a built-in streaming aggregation.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _make_update_profile(ttl_minutes: int | None, event_time: bool = False):
    def _update_profile(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if ttl_minutes is not None and state.hasTimedOut:
            # idle key: drop its state entirely — this is what keeps
            # memory O(active users) on an unbounded stream
            state.remove()
            return
        if state.exists:
            n, s, mx, last_us = state.get
        else:
            n, s, mx, last_us = 0, 0.0, float("-inf"), 0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, s, mx, last_us))
        if ttl_minutes is not None:
            if event_time:
                # expiry pinned to EVENT time: the key dies when the
                # watermark passes last-event + TTL. Unlike the
                # processing-time flavor this is replay-stable — a
                # backfill at 100× speed expires exactly the same keys.
                # Spark requires the timeout to sit beyond the current
                # watermark; clamp for late-arriving keys.
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(last_us // 1000 + ttl_minutes * 60 * 1000, wm_ms + 1)
                )
            else:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [mx],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return _update_profile


def user_activity_profile(
    events: DataFrame,
    ttl_minutes: int | None = None,
    *,
    event_time: bool = False,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming per-user profile with arbitrary state. Works on a
    streaming DataFrame (micro-batch incremental) — on a batch frame
    use ``user_activity_profile_batch`` (same result, one pass).

    ``ttl_minutes=None`` keeps state forever (bounded key space).
    With a TTL, idle keys expire via:

    - ``event_time=False``: ProcessingTimeTimeout — wall-clock idle
      time. Right for live serving, WRONG for replays: a backfill
      replayed at 100× speed never leaves a key idle long enough.
    - ``event_time=True``: EventTimeTimeout — a key expires when the
      stream's WATERMARK passes its last event + TTL, so expiry is a
      pure function of the data and identical live or replayed. The
      input gets ``withWatermark("ts", watermark_delay)`` applied
      (required by the timeout mode, and what bounds state for late
      data generally)."""
    if ttl_minutes is None:
        timeout = GroupStateTimeout.NoTimeout
    elif event_time:
        timeout = GroupStateTimeout.EventTimeTimeout
        events = events.withWatermark("ts", watermark_delay)
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(ttl_minutes, event_time),
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def stream_profile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-started applyInPandasWithState plan behind q_stream_profile
    (same state operator over the catalog events stream; the final
    batch-side max-n_events projection keeps names/types identical)
    for analysis tooling."""
    from pyspark.sql import functions as F

    from .events import read_event_stream_auto

    ev = read_event_stream_auto(spark, sf_dir).withColumn(
        "value", F.round(F.col("value") * 100, 0)
    )
    return user_activity_profile(ev)


def q_stream_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract ARBITRARY-STATE streaming query: the per-user
    running activity profile (applyInPandasWithState) over the events
    table staged as three time-ordered micro-batches, update-mode
    memory sink, final state = the max-``n_events`` row per user
    (the counter is strictly monotone per emission, so that row IS the
    converged profile).

    Exactness without trusting float accumulation order: the stream
    feeds the state function ``value`` pre-scaled to integral CENTS
    (round(value·100) — exact for 2-decimal business values), so the
    running double sum adds only integers (exact up to 2^53 — at
    100 TB scale the state type would widen to int128/decimal, same
    plan) and the final single division by 100 is correctly rounded —
    bit-identical to the oracle's exact-decimal sum. This puts a
    hash-verified driver row on the applyInPandasWithState code path
    (per-key state across micro-batches), which only pytest covered
    before.

    Scale: state is four scalars per user, shuffled once per
    micro-batch on user_id — the cost profile of a built-in streaming
    agg; TTL/expiry variants are pinned in tests/test_stateful_streaming.py."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .events import (
        _drain_to_memory,
        read_staged_event_stream,
        stage_event_files,
    )

    src = stage_event_files(spark, sf_dir, n_files=3)
    ev = read_staged_event_stream(spark, src).withColumn(
        "value", F.round(F.col("value") * 100, 0)
    )
    profiles = user_activity_profile(ev)
    sink = _drain_to_memory(profiles, "stream_profile", output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            (F.col("sum_value") / F.lit(100.0)).alias("sum_value"),
            (F.col("max_value") / F.lit(100.0)).alias("max_value"),
            "last_ts",
        )
    )


def user_activity_profile_batch(events: DataFrame) -> DataFrame:
    """Batch twin (plain aggregation) — what the streaming state
    converges to after all input; tests assert equality."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
        F.max("ts").alias("last_ts"),
    )


# --- streaming EWMA (arbitrary-state recurrence) ---------------------------

EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _update_ewma(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    from ..operators.events import EWMA_ALPHA

    a, b = EWMA_ALPHA, 1.0 - EWMA_ALPHA
    (user_id,) = key
    if state.exists:
        n, s = state.get
    else:
        n, s = 0, 0.0
    for pdf in pdfs:
        # deterministic in-batch order; across micro-batches the staged
        # slices are (ts, event_id)-ordered, so the full fold order is
        # exactly the batch twin's array_sort order
        pdf = pdf.sort_values(["ts", "event_id"])
        for x in pdf["value"].tolist():
            x = float(x)
            # Python float IS an IEEE double: s*b + x*a is the same two
            # products + one add the JVM fold runs — bit-identical, so
            # the batch oracle hash-matches with no tolerance. The
            # per-row loop is the recurrence itself (inherently
            # sequential per key), not an avoidable anti-pattern; rows
            # per (key, batch) are bounded by per-user activity.
            s = x if n == 0 else s * b + x * a
            n += 1
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "ewma": [s]}
    )


def user_ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user EWMA via applyInPandasWithState — the
    arbitrary-state form of the inherently sequential per-key
    recurrence (operators/events.q_ewma_smooth is the batch twin).
    State is two scalars per user; one hash exchange on user_id per
    micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_ewma_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-started applyInPandasWithState plan behind q_stream_ewma for
    the analysis tools."""
    from .events import read_event_stream_auto

    return user_ewma_stream(read_event_stream_auto(spark, sf_dir))


def q_stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract stateful-streaming EWMA: the per-user
    exponential smoother run INCREMENTALLY over the events table
    staged as three time-ordered micro-batches (per-key state carried
    across batches by applyInPandasWithState), update-mode memory
    sink, final state = the max-``n_events`` row per user.

    HASH-VERIFIED against the BATCH oracle (the same DuckDB
    list_reduce SQL as ewma_smooth): the staged slices partition the
    table on (ts, event_id) ntiles, each batch sorts its rows the same
    way, and every fold step is the identical IEEE-double expression —
    so the incremental fold's final state equals the batch fold
    bit-for-bit. That makes this the engine's second hash-verified
    applyInPandasWithState row, and the first that carries a FLOAT
    recurrence (stream_profile's state is integral cents): it proves
    order-stable state handoff across micro-batch boundaries, which is
    exactly the property a production streaming smoother needs after
    restarts/backfills."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .events import (
        _drain_to_memory,
        read_staged_event_stream,
        stage_event_files,
    )

    src = stage_event_files(spark, sf_dir, n_files=3)
    ev = read_staged_event_stream(spark, src)
    out = user_ewma_stream(ev)
    sink = _drain_to_memory(out, "stream_ewma", output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "ewma")
    )

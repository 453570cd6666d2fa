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

"""Streaming joins: stream-stream interval join with watermarked
state, and stateless stream-static dimension enrichment.

The interval join is the streaming twin of operators/asof.py's range
join: match each `left` event with `right` events of the same key
within a bounded time interval. The interval bound + watermarks are
what make the join state finite — Spark evicts buffered rows once the
watermark passes their latest possible match, so state is O(events
within the interval window), not O(stream).

The stream-static join is the other canonical streaming join: enrich
each event with a slowly-changing dimension table. It needs no
watermark and no state at all — each micro-batch joins against the
(broadcast) static side and emits immediately, so stream output
equals the batch join exactly (asserted in tests), not merely
eventually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (left, right) with equal ``key`` and
    ``left.ts <= right.ts < left.ts + gap``. Both inputs must carry
    ``ts`` and an ``event_id``; output keeps both ids and timestamps."""
    lt = (
        left.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("k"),
            F.col("ts").alias("lts"),
            F.col("event_id").alias("left_id"),
        )
    )
    rt = (
        right.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("rk"),
            F.col("ts").alias("rts"),
            F.col("event_id").alias("right_id"),
        )
    )
    return lt.join(
        rt,
        (F.col("k") == F.col("rk"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") < F.col("lts") + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
        "inner",
    ).select("k", "left_id", "right_id", "lts", "rts")


def enrich_stream(
    events: DataFrame, dim: DataFrame, key: str, dim_key: str
) -> DataFrame:
    """Stream-static dimension enrichment: left-join each event row
    against a static dimension frame on ``key == dim_key``, keeping
    every event (unmatched keys carry NULL dim columns).

    The static side is explicitly broadcast: at cluster scale the
    dimension refreshes per micro-batch from its source and ships to
    executors as a map-side hash table, so the event stream itself is
    never shuffled — the same plan Catalyst picks for the batch twin,
    which is why stream and batch output are identical row-for-row."""
    return events.join(
        F.broadcast(dim), events[key] == dim[dim_key], "left"
    ).drop(dim_key)

"""Streaming deduplication — the incremental twin of operators/dedup.

An ingestion pipeline sees the same record more than once (at-least-
once sources, retried producers); batch dedup (dedup.py) cleans a
corpus at rest, this cleans it in flight. ``dropDuplicatesWithinWatermark``
keeps per-key state only until the key's event time falls behind the
watermark, so state is bounded by (duplication horizon × arrival rate)
instead of growing with the stream — the property that makes streaming
dedup runnable forever. Exact-once output holds for duplicates arriving
within the watermark delay of each other, which is the CDC/retry case;
cross-day replays are a batch reconciliation problem by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup_events(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Drop re-deliveries of the same event_id arriving within the
    watermark horizon. Emits each event exactly once (append mode)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )

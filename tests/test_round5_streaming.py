"""Round-5 wave-3 streaming contract queries: watermark dedup,
stream-stream interval join, applyInPandasWithState profile.

Each q_* is registered with a driver oracle; these tests pin the
stream == batch invariant that makes those oracles valid, plus the
cross-micro-batch behaviors (re-delivery in a later batch, join pair
straddling a batch boundary) the contract rows exist to exercise."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.sources.catalog import load_table


def _key(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_q_stream_dedup_exactly_once(spark, sf_dir):
    """Every event landed twice (full re-delivery two micro-batches
    later); the sink must hold each exactly once == the events table."""
    from cs422pp_mapreduce_spark.streaming.dedup import q_stream_dedup

    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    got = _key(q_stream_dedup(spark, sf_dir).collect(), cols)
    want = _key(load_table(spark, sf_dir, "events").collect(), cols)
    assert got == want
    assert len(got) > 0


def test_q_stream_interval_join_equals_batch(spark, sf_dir):
    """End-of-stream inner interval-join output equals the batch join
    (each qualifying pair exactly once, none dropped, none doubled)."""
    from cs422pp_mapreduce_spark.streaming.joins import (
        q_stream_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    l = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("lts"),
        F.col("event_id").alias("left_id"),
    )
    r = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("rk"),
        F.col("ts").alias("rts"),
        F.col("event_id").alias("right_id"),
    )
    batch = l.join(
        r,
        (F.col("k") == F.col("rk"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") < F.col("lts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("k", "left_id", "right_id", "lts", "rts")

    cols = ["k", "left_id", "right_id", "lts", "rts"]
    got = _key(q_stream_interval_join(spark, sf_dir).collect(), cols)
    want = _key(batch.collect(), cols)
    assert got == want
    assert len(got) > 0


def test_stream_interval_join_pairs_cross_batch_boundary(spark, tmp_path):
    """A view in micro-batch 1 matching a purchase in micro-batch 2
    (stage_event_files splits at the time median → these two rows land
    in different files) is still paired — the buffered-state path."""
    from cs422pp_mapreduce_spark.streaming.joins import (
        q_stream_interval_join,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def row(eid, minutes, etype):
        return (eid, t0 + dt.timedelta(minutes=minutes), 1, etype, 1.0, "{}")

    # median of the 4 timestamps falls between minutes 10 and 20, so
    # ntile(2) puts events 1,2 in slice 1 and 3,4 in slice 2
    rows = [
        row(1, 0, "click"),
        row(2, 10, "view"),       # batch 1
        row(3, 20, "purchase"),   # batch 2, 10 min after the view
        row(4, 500, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    d = str(tmp_path / "events_fixture")
    df.coalesce(1).write.parquet(str(tmp_path / "events_fixture" / "events.parquet"))
    out = q_stream_interval_join(spark, d).collect()
    assert [(r["left_id"], r["right_id"]) for r in out] == [(2, 3)]


def test_q_stream_profile_equals_batch(spark, sf_dir):
    """Converged applyInPandasWithState state equals the batch
    aggregate, including the exact (cents-accumulated) value sum."""
    from cs422pp_mapreduce_spark.functions.numeric import exact_sum
    from cs422pp_mapreduce_spark.streaming.stateful import q_stream_profile

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", 2, "sum_value"),
            F.max("value").alias("max_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    cols = ["user_id", "n_events", "sum_value", "max_value", "last_ts"]
    got = _key(q_stream_profile(spark, sf_dir).collect(), cols)
    want = _key(batch.collect(), cols)
    assert got == want
    assert len(got) > 0


def test_stage_event_files_time_ordered(spark, sf_dir):
    """Staged slices are disjoint, complete, time-ordered, and mtime-
    ordered (what makes the file-stream source process them in event
    order)."""
    import os

    import pyarrow.parquet as pq

    from cs422pp_mapreduce_spark.streaming.events import stage_event_files

    src = stage_event_files(spark, sf_dir, n_files=3)
    files = sorted(os.listdir(src))
    assert files == ["slice1.parquet", "slice2.parquet", "slice3.parquet"]
    spans, total = [], 0
    for f in files:
        t = pq.read_table(os.path.join(src, f), columns=["ts"])
        ts = t.column("ts").to_pylist()
        spans.append((min(ts), max(ts)))
        total += len(ts)
    assert total == load_table(spark, sf_dir, "events").count()
    assert spans[0][1] <= spans[1][0] and spans[1][1] <= spans[2][0]
    mtimes = [os.path.getmtime(os.path.join(src, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3


def test_q_stream_enrich_equals_batch(spark, sf_dir):
    """Stream-static broadcast enrichment equals the batch left join
    row-for-row (stateless — per-micro-batch emission, no state)."""
    from cs422pp_mapreduce_spark.streaming.joins import q_stream_enrich

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).alias("type_n")
    )
    batch = ev.join(dim, ev.event_type == dim.et, "left").select(
        "event_id", "event_type", "value", "type_n"
    )
    cols = ["event_id", "event_type", "value", "type_n"]
    got = _key(q_stream_enrich(spark, sf_dir).collect(), cols)
    want = _key(batch.collect(), cols)
    assert got == want
    assert len(got) > 0

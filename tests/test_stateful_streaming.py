"""applyInPandasWithState custom stateful operator: the final streamed
state must equal the one-pass batch aggregation."""

from __future__ import annotations

import pytest

from cs422pp_mapreduce_spark.sources.catalog import load_table
from cs422pp_mapreduce_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
)
from cs422pp_mapreduce_spark.streaming.stateful import (
    user_activity_profile,
    user_activity_profile_batch,
)


@pytest.fixture()
def stream_dir(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    # two files → two micro-batches → state actually carries over
    d = str(tmp_path / "src")
    ev.where("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(d)
    ev.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(d)
    return d


def test_stateful_profile_converges_to_batch(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    run_stream_to_memory(
        user_activity_profile(stream), "t_profiles", mode="update"
    )
    # update mode emits one row per user per micro-batch; the final
    # state per user is the row with max n_events (monotone counters)
    emitted = spark.table("t_profiles").toPandas()
    batch = user_activity_profile_batch(
        load_table(spark, sf_dir, "events")
    ).toPandas()
    got = {
        int(r["user_id"]): (int(r["n_events"]), round(float(r["sum_value"]), 4))
        for _, r in emitted.groupby("user_id")
        .agg({"n_events": "max", "sum_value": "max", "user_id": "first"})
        .iterrows()
    }
    want = {
        int(r["user_id"]): (int(r["n_events"]), round(float(r["sum_value"]), 4))
        for _, r in batch.iterrows()
    }
    assert got == want

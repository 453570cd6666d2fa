"""Checkpoint-recovery semantics: a restarted query resumes from its
checkpoint and processes ONLY data that arrived since — no reprocessing,
no loss — which is the exactly-once contract Structured Streaming's
offset log + sink commit log provide over a replayable source.

The reference has no recovery story at all (a failed worker loses its
partition); this is the Spark-native upgrade the SURVEY's streaming
section claims, so it gets a test.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _run_available(spark, src_dir, ckpt, table):
    stream = (
        spark.readStream.schema("value string").format("text").load(src_dir)
    )
    counts = stream.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    q = (
        counts.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    with open(f"{src}/batch0.txt", "w") as f:
        f.write("alpha\nbeta\nalpha\n")
    _run_available(spark, src, ckpt, "t_recovery")
    first = {
        r["value"]: r["cnt"] for r in spark.table("t_recovery").collect()
    }
    assert first == {"alpha": 2, "beta": 1}

    # new data lands while the query is DOWN; the restart must pick up
    # exactly the delta and merge it into state recovered from the
    # checkpoint (complete-mode counts include the old data exactly once)
    with open(f"{src}/batch1.txt", "w") as f:
        f.write("beta\ngamma\n")
    _run_available(spark, src, ckpt, "t_recovery2")
    second = {
        r["value"]: r["cnt"] for r in spark.table("t_recovery2").collect()
    }
    assert second == {"alpha": 2, "beta": 2, "gamma": 1}

    # a third restart with NO new data must execute NO batch at all:
    # the offset log already covers the source listing, so nothing is
    # replayed and the fresh memory sink stays empty — the observable
    # form of "no reprocessing after recovery"
    _run_available(spark, src, ckpt, "t_recovery3")
    assert spark.table("t_recovery3").count() == 0


def test_recovery_contract_query_processes_only_delta(spark, sf_dir):
    """The driver-contract recovery sequence genuinely RESUMES: phase 2
    must read only the files that landed while the query was down (the
    offset log covers phase 1's), and its state must still include
    phase 1's counts. A fresh-start phase 2 would read all 4 slices;
    an offset-only recovery without state would under-count."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cs422pp_mapreduce_spark.sources.catalog import TABLE_SCHEMAS, load_table
    from cs422pp_mapreduce_spark.streaming.events import _tumbling_agg

    base = tempfile.mkdtemp(prefix="recovery_delta_")
    stage, src, ckpt = (os.path.join(base, d) for d in ("stage", "src", "ckpt"))
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events")
    for i in range(4):
        ev.where(F.col("event_id") % 4 == i).coalesce(1).write.parquet(
            f"{stage}/s{i}"
        )

    def land(i):
        d = f"{stage}/s{i}"
        f = next(n for n in os.listdir(d) if n.endswith(".parquet"))
        shutil.copy(os.path.join(d, f), os.path.join(src, f"s{i}.parquet"))

    def run(table):
        raw = (
            spark.readStream.schema(TABLE_SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            _tumbling_agg(raw)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows_read = sum(p["numInputRows"] for p in q.recentProgress)
        q.stop()
        return rows_read

    land(0)
    land(1)
    run("t_rec_phase1")
    land(2)
    land(3)
    delta = ev.where(F.col("event_id") % 4 >= 2).count()
    total = ev.count()
    rows_read = run("t_rec_phase2")
    assert rows_read == delta, (rows_read, delta)
    # state recovered: final counts cover ALL events, not just the delta
    final = spark.table("t_rec_phase2").agg(F.sum("n_events")).collect()[0][0]
    assert final == total, (final, total)


def test_upsert_versioned_replay_is_idempotent(spark, tmp_path):
    """A replayed foreachBatch (same batch_id re-offered after an
    uncommitted restart) must leave the table identical: the apply
    merges from the newest OLDER version and overwrites its own, so
    applying batch 1 twice — even with different row order — yields
    the same table as applying it once."""
    from cs422pp_mapreduce_spark.streaming.events import (
        table_versions,
        upsert_versioned,
    )

    tdir = str(tmp_path / "target")
    import os

    os.makedirs(tdir)
    b0 = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    )
    b1 = spark.createDataFrame(
        [("b", 20), ("c", 30)], "k string, v int"
    )
    upsert_versioned(tdir, b0, 0, "k")
    upsert_versioned(tdir, b1, 1, "k")
    once = sorted(
        (r["k"], r["v"])
        for r in spark.read.parquet(f"{tdir}/v1").collect()
    )
    assert once == [("a", 1), ("b", 20), ("c", 30)]
    # replay batch 1 (restart re-offers the same id)
    upsert_versioned(tdir, b1, 1, "k")
    again = sorted(
        (r["k"], r["v"])
        for r in spark.read.parquet(f"{tdir}/v1").collect()
    )
    assert again == once
    assert table_versions(tdir) == [0, 1]

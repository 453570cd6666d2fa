"""Round-5 wave-5: streaming flagship, bucketed-join contract,
z-order skipping index."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.sources.catalog import load_table


def test_stream_wordcount_equals_batch(spark, sf_dir):
    """Two-micro-batch streaming word count converges to the batch
    flagship exactly (integer counts, complete mode)."""
    from cs422pp_mapreduce_spark.operators.wordcount import wordcount
    from cs422pp_mapreduce_spark.streaming.wordcount import (
        q_stream_wordcount,
    )

    got = [(r["word"], r["cnt"]) for r in q_stream_wordcount(spark, sf_dir).collect()]
    want = [(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()]
    assert got == want
    assert len(got) > 0


def test_bucketed_join_equals_plain(spark, sf_dir):
    """Bucketing is pure layout: the bucketed write→read→join rollup
    equals the plain-join aggregation."""
    from cs422pp_mapreduce_spark.functions.numeric import exact_sum
    from cs422pp_mapreduce_spark.operators.maintenance import (
        q_bucketed_join,
    )

    ords = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    plain = (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice", 2, "revenue"),
        )
    )
    key = lambda rows: sorted(
        (r["c_mktsegment"], r["n_orders"], r["revenue"]) for r in rows
    )
    assert key(q_bucketed_join(spark, sf_dir).collect()) == key(
        plain.collect()
    )


def test_bucketed_join_plan_has_no_shuffle(spark, sf_dir):
    """The joined bucketed tables sort-merge-join with ZERO Exchange —
    the written-once shuffle is actually reused (asserted on this
    contract query's own tables, not just the generic sink test)."""
    from cs422pp_mapreduce_spark.operators.maintenance import (
        q_bucketed_join,
    )

    # building the query writes the bucketed tables eagerly; the
    # returned frame's plan is the aggregation over the bucketed join
    df = q_bucketed_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    # no shuffle below the join: scans feed sorts directly
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_part


def test_zorder_files_prune_both_dimensions(spark, sf_dir):
    """The per-file min/max index actually skips: for point predicates
    on EITHER dimension, most files' ranges exclude the probe —
    the property date-only sorting cannot give for custkey."""
    from cs422pp_mapreduce_spark.operators.maintenance import q_zorder_stats

    files = q_zorder_stats(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in files) == load_table(
        spark, sf_dir, "orders"
    ).count()
    mx = max(r["max_cust"] for r in files)
    probes = [1 + (mx * i) // 7 for i in range(7)]
    cand = [
        sum(1 for r in files if r["min_cust"] <= k <= r["max_cust"])
        for k in probes
    ]
    assert sum(cand) / (len(probes) * len(files)) < 0.45
    d0 = min(r["min_date"] for r in files)
    dprobes = [d0 + dt.timedelta(days=200 * i) for i in range(6)]
    dcand = [
        sum(1 for r in files if r["min_date"] <= d <= r["max_date"])
        for d in dprobes
    ]
    assert sum(dcand) / (len(dprobes) * len(files)) < 0.45

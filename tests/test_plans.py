"""Physical-plan assertions (SURVEY.md §4): the reference's physical
techniques must appear as their Catalyst equivalents — filters at the
scan, broadcasts for dims, partial aggregation before shuffles."""

from __future__ import annotations

from cs422pp_mapreduce_spark.operators import relational as R
from cs422pp_mapreduce_spark.operators.wordcount import wordcount_df
from cs422pp_mapreduce_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    partial_agg_count,
    pushed_filters,
)
from cs422pp_mapreduce_spark.sources.catalog import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = pushed_filters(R.q_filter_pred(spark, sf_dir))
    assert "l_quantity" in plan and "l_returnflag" in plan


def test_projection_pruning(spark, sf_dir):
    plan = explain_str(R.q_scan_project(spark, sf_dir))
    # ReadSchema must contain only the 3 projected columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_partkey" not in read and "l_shipdate" not in read


def test_broadcast_join_is_broadcast(spark, sf_dir):
    assert has_broadcast_join(R.q_broadcast_join(spark, sf_dir))


def test_multi_join_broadcasts_nation(spark, sf_dir):
    plan = explain_str(R.q_multi_join_agg(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_group_agg_has_partial_phase(spark, sf_dir):
    # Map-side combine (reference thread_pool.cc:90-98) ≡ partial_ agg
    assert partial_agg_count(R.q_group_agg(spark, sf_dir)) > 0


def test_wordcount_has_partial_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert partial_agg_count(wordcount_df(docs, "text")) > 0


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = explain_str(R.q_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan

"""Connected-components clustering + MERGE upsert semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.operators import maintenance as MT
from cs422pp_mapreduce_spark.operators.dedup import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.node, r.comp) for r in connected_components(df).collect()
    }


def test_cc_chain_collapses_to_min_label(spark):
    # a chain needs label propagation across hops, not just one join
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)}


def test_cc_separate_components_stay_separate(spark):
    got = _cc(spark, [(10, 11), (20, 21), (21, 22)])
    assert got == {(10, 10), (11, 10), (20, 20), (21, 20), (22, 20)}


def test_cc_direction_and_duplicates_irrelevant(spark):
    # reversed edges and repeated edges give the same components
    got = _cc(spark, [(5, 1), (1, 5), (5, 3), (3, 1)])
    assert got == {(1, 1), (3, 1), (5, 1)}


def test_merge_upsert_invariants(spark, sf_dir):
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    orders_n = load_table(spark, sf_dir, "orders").count()
    merged = MT.q_merge_upsert(spark, sf_dir).persist()
    by_action = {
        r.merge_action: r.n
        for r in merged.groupBy("merge_action")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every target row survives exactly once; each update spawned one insert
    assert by_action["updated"] == by_action["inserted"]
    assert by_action["kept"] + by_action["updated"] == orders_n
    assert merged.count() == orders_n + by_action["inserted"]
    # merge key stays unique
    assert merged.select("o_orderkey").distinct().count() == merged.count()
    merged.unpersist()

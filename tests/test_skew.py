"""Salting: salted plans must produce bit-identical results to the
straight plans, with the hot key spread across buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.functions.numeric import exact_sum
from cs422pp_mapreduce_spark.functions.skew import (
    salted_join_small_skewed,
    salted_sum_count,
    with_salt,
)


def _skewed_df(spark):
    # 90% of rows share one key — the classic hot-key shape
    rows = [("hot" if i % 10 else f"k{i}", float(i % 97) + 0.25) for i in range(2000)]
    return spark.createDataFrame(rows, "k string, v double")


def test_salted_agg_equals_straight(spark):
    df = _skewed_df(spark)
    straight = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(exact_sum("v", 2, "s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"])
        for r in salted_sum_count(
            df,
            ["k"],
            {"s": (exact_sum("v", 2), "sum"), "n": (F.count(F.lit(1)), "count")},
            buckets=8,
        ).collect()
    }
    assert salted == straight  # bit-identical incl. decimal-routed sums


def test_salted_minmax(spark):
    df = _skewed_df(spark)
    got = salted_sum_count(
        df, ["k"], {"lo": (F.min("v"), "min"), "hi": (F.max("v"), "max")}, buckets=4
    )
    want = df.groupBy("k").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_salted_rejects_unknown_merge_kind(spark):
    import pytest

    df = _skewed_df(spark)
    with pytest.raises(ValueError, match="unsupported merge kind"):
        salted_sum_count(df, ["k"], {"a": (F.avg("v"), "avg")}).collect()


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed_df(spark), buckets=8)
    n = df.where("k = 'hot'").select("__salt").distinct().count()
    assert n >= 6  # hot key lands in (nearly) all buckets


def test_salted_join_equals_straight(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k11", 3)], "k string, tag long"
    )
    straight = big.join(small, "k")
    salted = salted_join_small_skewed(big, small, "k", buckets=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, straight.collect())
    )
"""Property-based tests (hypothesis, SURVEY.md §5.2 #4): invariants
that must hold for any input, with Spark runs bounded by small scopes.

One shared Spark fixture, small deadline-free examples: each property
runs a handful of generated corpora through the real operators.
"""

from __future__ import annotations

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.functions.numeric import exact_sum
from cs422pp_mapreduce_spark.operators.wordcount import wordcount_df

words = st.sampled_from(["a", "bb", "ccc", "Δ", "x1", "zz", "q"])
lines = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join), min_size=0, max_size=12
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus=lines)
@SLOW
def test_wordcount_matches_counter(spark, corpus):
    expected = collections.Counter(
        w for line in corpus for w in line.split(" ") if w != ""
    )
    df = spark.createDataFrame(
        [(l,) for l in corpus] or [("",)], "value string"
    )
    got = {r["word"]: r["cnt"] for r in wordcount_df(df).collect()}
    assert got == dict(expected)


@given(corpus=lines, nparts=st.integers(min_value=1, max_value=5))
@SLOW
def test_wordcount_partitioning_invariant(spark, corpus, nparts):
    base = spark.createDataFrame([(l,) for l in corpus] or [("",)], "value string")
    a = {tuple(r) for r in wordcount_df(base.coalesce(1)).collect()}
    b = {tuple(r) for r in wordcount_df(base.repartition(nparts)).collect()}
    assert a == b


@given(
    vals=st.lists(
        st.decimals(
            min_value="-99999.99", max_value="99999.99", places=2
        ).map(float),
        min_size=1,
        max_size=30,
    ),
    nparts=st.integers(min_value=1, max_value=4),
)
@SLOW
def test_exact_sum_partitioning_invariant(spark, vals, nparts):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    one = df.coalesce(1).agg(exact_sum("x", 2, "s")).collect()[0]["s"]
    many = df.repartition(nparts).agg(exact_sum("x", 2, "s")).collect()[0]["s"]
    assert one == many  # bit-identical, not approx — that's the contract


@given(ids=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40))
@SLOW
def test_dedup_keeps_min_id_per_key(spark, ids):
    rows = [(i, f"text-{i % 5}") for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["text"]: r["doc_id"]
        for r in df.groupBy("text").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    want: dict[str, int] = {}
    for i, t in rows:
        want[t] = min(want.get(t, i), i)
    assert got == want

"""Word-count tests (SURVEY.md §5.2): golden Counter oracle independent
of Spark and DuckDB, reference edge-case semantics, partitioning
invariance, and DataFrame≡RDD-facade agreement."""

from __future__ import annotations

import collections

import duckdb
import pytest

from cs422pp_mapreduce_spark.operators.wordcount import (
    wordcount,
    wordcount_df,
    wordcount_rdd,
)


def python_wordcount(texts: list[str]) -> dict[str, int]:
    c: collections.Counter[str] = collections.Counter()
    for t in texts:
        c.update(w for w in t.split(" ") if w != "")
    return dict(c)


@pytest.fixture(scope="module")
def golden(sf_dir):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    return python_wordcount(texts)


def test_wordcount_matches_python_counter(spark, sf_dir, golden):
    got = {r["word"]: r["cnt"] for r in wordcount(spark, sf_dir).collect()}
    assert got == golden


def test_wordcount_sorted_ascending(spark, sf_dir):
    words = [r["word"] for r in wordcount(spark, sf_dir).collect()]
    assert words == sorted(words)


def test_rdd_facade_agrees(spark, sf_dir, golden):
    got = {r["word"]: r["cnt"] for r in wordcount_rdd(spark, sf_dir).collect()}
    assert got == golden


def test_empty_tokens_dropped(spark):
    # The reference crashes on empty tokens (thread_pool.cc:125); we
    # filter them (SURVEY.md §7 decision), incl. the trailing-space
    # token the reference dodges by appending ' ' (thread_pool.cc:58).
    lines = spark.createDataFrame(
        [("a  b ",), ("",), (" a",)], schema="value string"
    )
    got = {r["word"]: r["cnt"] for r in wordcount_df(lines).collect()}
    assert got == {"a": 2, "b": 1}


def test_partitioning_invariance(spark):
    # Chunk-size invariance, the key property of the reference's chunked
    # split (thread_pool.cc:46-65): results never depend on layout.
    rows = [(f"w{i % 7} w{i % 3}",) for i in range(100)]
    one = spark.createDataFrame(rows, "value string").coalesce(1)
    many = spark.createDataFrame(rows, "value string").repartition(13)
    a = {(r["word"], r["cnt"]) for r in wordcount_df(one).collect()}
    b = {(r["word"], r["cnt"]) for r in wordcount_df(many).collect()}
    assert a == b


def test_sum_counts_equals_token_total(spark, sf_dir, golden):
    total = wordcount(spark, sf_dir).groupBy().sum("cnt").collect()[0][0]
    assert total == sum(golden.values())

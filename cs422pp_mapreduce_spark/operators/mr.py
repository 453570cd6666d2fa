"""MRJob — a thin MapReduce-paradigm facade over Spark RDDs.

The reference's programming model is: supply a map function and a
reduce function, the framework does split/combine/partition/shuffle/
sort/reduce/sink (/root/reference/mapreduce.cc:68-78,100-110). This
facade exposes exactly that contract on Spark, where each stage is the
built-in primitive (SURVEY.md §2.1 mapping):

    MRJob.from_text(spark, path)        input split  (thread_pool.cc:46-65)
        .flat_map(tokenize)             map           (thread_pool.cc:76-110)
        .map_to_pairs(lambda w: (w, 1))
        .combine_reduce(operator.add)   combiner+reduce (thread_pool.cc:90-98,
                                                         204-230; reduceByKey's
                                                         map-side combine ≡ the
                                                         reference's combiner)
        .partition_by(R[, first_char])  partition     (thread_pool.cc:121-134)
        .sort()                         sort          (thread_pool.cc:199-202)
        .sink_text(path)                sink          (thread_pool.cc:232-242;
                                                       R partitions → R files)

Everything the reference hand-built around this — jobtracker, thread
pools, tmp-file shuffle, poison-pill termination, locality scheduling
(mapreduce.cc:140-205, thread_pool.cc:3-44) — is Spark's scheduler and
shuffle, deliberately not reimplemented (SURVEY.md §4.2).

This facade is the *paradigm-parity* API; the engine's hot paths are
the DataFrame operators (Python lambdas here don't codegen). The
``to_df`` escape hatch crosses back into Catalyst space.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.rdd import RDD
from pyspark.sql import DataFrame, SparkSession


def first_char_partitioner(num_partitions: int) -> Callable[[Any], int]:
    """Reference-layout partitioner: ascii(key[0]) % R
    (thread_pool.cc:127-132, deliberate per README.md:9 — words sharing
    a first character co-locate). Only affects file layout, never query
    results; provided for byte-level output parity experiments."""

    def part(key: Any) -> int:
        s = str(key)
        return (ord(s[0]) % num_partitions) if s else 0

    return part


class MRJob:
    """Chainable MapReduce pipeline over an RDD."""

    def __init__(self, spark: SparkSession, rdd: RDD):
        self.spark = spark
        self.rdd = rdd

    # --- sources ---------------------------------------------------------

    @classmethod
    def from_text(cls, spark: SparkSession, path: str, min_partitions: int | None = None) -> "MRJob":
        sc = spark.sparkContext
        return cls(spark, sc.textFile(path, min_partitions) if min_partitions
                   else sc.textFile(path))

    @classmethod
    def from_df(cls, df: DataFrame, column: str | None = None) -> "MRJob":
        rdd = df.rdd.map(lambda r: r[column]) if column else df.rdd
        return cls(df.sparkSession, rdd)

    # --- map side --------------------------------------------------------

    def map(self, fn: Callable[[Any], Any]) -> "MRJob":
        return MRJob(self.spark, self.rdd.map(fn))

    def flat_map(self, fn: Callable[[Any], Any]) -> "MRJob":
        return MRJob(self.spark, self.rdd.flatMap(fn))

    def filter(self, fn: Callable[[Any], bool]) -> "MRJob":
        return MRJob(self.spark, self.rdd.filter(fn))

    def map_to_pairs(self, fn: Callable[[Any], tuple[Any, Any]]) -> "MRJob":
        return MRJob(self.spark, self.rdd.map(fn))

    # --- shuffle side ----------------------------------------------------

    def combine_reduce(self, fn: Callable[[Any, Any], Any]) -> "MRJob":
        """reduceByKey: map-side combine (≡ the reference's per-chunk
        combiner) + shuffle + final merge in one primitive."""
        return MRJob(self.spark, self.rdd.reduceByKey(fn))

    def group_reduce(self, fn: Callable[[Any, list], Any]) -> "MRJob":
        """groupByKey-then-reduce — the reference's literal two-step
        (sort/group then reduce). Shuffles ALL records; kept for parity
        demonstrations, combine_reduce is the right call."""
        return MRJob(
            self.spark,
            self.rdd.groupByKey().mapValues(lambda vs: fn(None, list(vs))),
        )

    def partition_by(
        self,
        num_partitions: int,
        partitioner: Callable[[Any], int] | None = None,
    ) -> "MRJob":
        return MRJob(
            self.spark, self.rdd.partitionBy(num_partitions, partitioner)
        )

    def sort(self, ascending: bool = True) -> "MRJob":
        return MRJob(self.spark, self.rdd.sortByKey(ascending))

    def sort_within_partitions(self) -> "MRJob":
        """Per-partition key sort without re-partitioning — exactly the
        reference's SortFunction scope (thread_pool.cc:199-202)."""
        return MRJob(
            self.spark,
            self.rdd.mapPartitions(
                lambda it: iter(sorted(it, key=lambda kv: kv[0]))
            ),
        )

    # --- sinks -----------------------------------------------------------

    def sink_text(self, path: str) -> None:
        """Partitioned text sink, '{key} {value}' rows — the reference's
        output format ("word count\\n", thread_pool.cc:238); one file
        per partition like its per-reducer .out files."""
        self.rdd.map(lambda kv: f"{kv[0]} {kv[1]}").saveAsTextFile(path)

    def collect(self) -> list:
        return self.rdd.collect()

    def to_df(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame(self.rdd, schema=schema)

"""Streaming word count — the reference's single query, incremental.

The reference processes its corpus as a two-phase batch with a hard
barrier (/root/reference/mapreduce.cc:200). The same declarative plan
(explode(split) → filter → groupBy.count) behind ``readStream`` is the
engine's unbounded-corpus form: each micro-batch updates the running
counts via the same partial→final aggregation; complete/update output
modes expose the running totals. This is the cleanest demonstration
that the engine's operators are execution-model-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.wordcount import wordcount_df


def read_text_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """Line stream over a directory of text files."""
    return (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )


def stream_wordcount(lines: DataFrame) -> DataFrame:
    """Running (word, cnt) totals over a line stream — literally the
    batch operator applied to a streaming frame."""
    return wordcount_df(lines)

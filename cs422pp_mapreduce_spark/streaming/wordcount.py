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


def stream_wordcount_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-started streaming plan behind q_stream_wordcount (the same
    aggregation over the catalog documents file) for analysis tooling."""
    from ..sources.catalog import TABLE_SCHEMAS

    raw = (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    return wordcount_df(raw, "text")


def q_stream_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP query — the reference's word count — computed
    through Structured Streaming: the documents table staged as two
    files (two micro-batches), counts accumulated incrementally in
    streaming aggregation state, complete-mode memory sink, drained
    with availableNow.

    Hash-verified against the SAME DuckDB oracle as the batch
    flagship: integer counts converge to the batch totals regardless
    of micro-batch boundaries (partial→final aggregation is the same
    plan shape the batch form compiles to — the engine's operators are
    execution-model-agnostic, which is the whole Spark-vs-reference
    point: the reference's two-phase barrier [mapreduce.cc:200] cannot
    express 'same query, unbounded input').

    Scale: per-batch map-side partials shuffle O(distinct words), and
    state is O(vocabulary) — the streaming wordcount every ingest
    pipeline runs as its arrival monitor."""
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..sources.catalog import TABLE_SCHEMAS, load_table
    from .events import _drain_to_memory

    base = tempfile.mkdtemp(prefix="stream_wc_")
    parts, src = os.path.join(base, "parts"), os.path.join(base, "src")
    os.makedirs(src)
    docs = load_table(spark, sf_dir, "documents")
    sliced = docs.withColumn(
        "_slice", F.ntile(2).over(Window.orderBy("doc_id"))
    )
    now = _time.time()
    for i in (1, 2):
        d = f"{parts}/s{i}"
        sliced.where(F.col("_slice") == i).drop("_slice").coalesce(
            1
        ).write.parquet(d)
        f = next(n for n in os.listdir(d) if n.endswith(".parquet"))
        dst = os.path.join(src, f"slice{i}.parquet")
        shutil.copy(os.path.join(d, f), dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    shutil.rmtree(parts)

    raw = (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = wordcount_df(raw, "text")
    return _drain_to_memory(counts, "stream_wordcount").orderBy("word")

"""cs422pp_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference MapReduce platform (lhan0123/CS422PP-mapreduce — a C++/MPI
word-count MapReduce pipeline; see SURVEY.md), re-expressed Spark-first:

- the reference's physical pipeline (input split → tokenize+combine →
  hash partition → shuffle → sort → group-reduce → partitioned sink,
  /root/reference/thread_pool.cc:46-242) is expressed as declarative
  DataFrame plans so Catalyst/Tungsten own the physical strategy;
- its single hardcoded query (word count) generalizes to a full
  relational surface (scan/filter/agg/join/window/set-ops/sort) plus
  event-time windows, text analytics, dedup, and similarity search —
  the operators a 100 TB training-data pipeline needs.

Package layout:
    session.py    SparkSession builder with scale-oriented defaults
    sources/      schemas + parquet/text loaders + view registration
    operators/    query operators (wordcount, relational, events,
                  dedup, similarity, multimodal, MR facade)
    functions/    reusable column-expression builders (text analytics)
    plans/        plan inspection helpers (explain/shuffle audit)
    streaming/    Structured Streaming variants of event-time ops
"""

__version__ = "0.1.0"

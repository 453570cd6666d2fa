"""Partitioned sinks — the write side of the engine.

The reference's sink is one sorted text file per reducer partition
(`{job}-{r}.out`, /root/reference/thread_pool.cc:232-242) with
append-mode tmp files truncated up front (thread_pool.cc:245-256).
Spark-first generalization: ``df.write`` with explicit mode and layout
control. Number of output files = number of partitions, exactly the
reference's invariant.

Scale notes:
- ``partition_cols`` → hive-style directory partitioning: the layout
  that makes downstream scans prune;
- ``sort_cols`` + ``files_per_partition`` → sortWithinPartitions after
  a repartition: the reference's per-file ascending order, and the
  layout that maximizes parquet min/max pruning;
- 'overwrite' ≡ the reference's CleanExistingFile truncation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: Sequence[str] = (),
    sort_cols: Sequence[str] = (),
    files_per_partition: int | None = None,
) -> None:
    out = df
    if files_per_partition:
        out = out.repartition(files_per_partition, *partition_cols) \
            if partition_cols else out.repartition(files_per_partition)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (Spark-native columnar; zlib by default) — same
    pushdown/pruning properties as parquet on re-read."""
    df.write.mode(mode).orc(path)


def write_kv_text(
    df: DataFrame, path: str, key_col: str, value_col: str,
    num_partitions: int | None = None, mode: str = "overwrite",
) -> None:
    """Reference-format sink: '{key} {value}' text rows, one file per
    partition, ascending by key within each file
    (thread_pool.cc:199-202,232-242)."""
    from pyspark.sql import functions as F

    out = df.select(
        F.concat_ws(" ", F.col(key_col).cast("string"),
                    F.col(value_col).cast("string")).alias("value")
    )
    if num_partitions:
        out = out.repartition(num_partitions)
    out.sortWithinPartitions("value").write.mode(mode).text(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    buckets: int = 8,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink (`bucketBy` requires `saveAsTable`).

    Bucketing is the 100 TB co-location tool: two tables bucketed the
    same way on the join key sort-merge-join with ZERO Exchange — the
    shuffle is paid once at write time, then every downstream join and
    aggregation on the bucket key is shuffle-free
    (tests/test_sources_sinks.py asserts the no-Exchange plan)."""
    writer = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.option("path", path).format("parquet").saveAsTable(table)

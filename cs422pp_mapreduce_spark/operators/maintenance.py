"""Table-maintenance operators: MERGE-style upsert as a batch plan.

The reference's only sink semantics are truncate-and-rewrite
(/root/reference/thread_pool.cc:253 — reducers open their output file
with std::ofstream::trunc); a warehouse engine additionally needs the
incremental path: apply a changeset of updates + inserts to a target
without rewriting unmatched rows' values. Formats with a transaction
log (Delta/Iceberg) run this exact plan under `MERGE INTO`; expressed
on plain DataFrames it is anti-join + union — which is also the plan
those formats generate, so the shape benchmarked here IS the scale
shape (one shuffle-or-broadcast join on the merge key, one union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# Deterministic changeset: ~10% of orders (hash-mod bucket 0) get
# re-priced; each also spawns one new row with a shifted key. A pure
# function of the key, so Spark and the DuckDB oracle derive the
# identical changeset independently.
_NEW_KEY_OFFSET = 10_000_000


def _bucket(key):
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast(
            "bigint"
        )
        % 10
    )


def changeset(orders: DataFrame) -> DataFrame:
    """(o_orderkey, …, merge_action) updates + inserts derived from the
    target itself — stands in for a CDC feed."""
    sampled = orders.where(_bucket(F.col("o_orderkey")) == 0)
    updates = sampled.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        "o_orderdate",
        F.lit("REPRICED").alias("o_orderpriority"),
    )
    inserts = sampled.select(
        (F.col("o_orderkey") + F.lit(_NEW_KEY_OFFSET)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        F.lit("BACKFILL").alias("o_orderpriority"),
    )
    return updates.unionByName(inserts)


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT: source
    rows win on key collision, unmatched target rows pass through.

    One anti-join (broadcast when the changeset is small — the common
    CDC case — else a shuffle join on the key) plus a union. No
    correlated logic, no per-row Python; at 100 TB this is bounded by
    one pass over the target."""
    kept = target.join(source.select(key), key, "left_anti")
    return source.unionByName(kept)


# SCD2 effective date of the deterministic changeset (pure function of
# the key, like the merge changeset above).
_SCD2_EFFECTIVE = "1998-01-01"


def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a changeset to the
    ``customer`` dimension, closing the old version of changed rows
    (valid_to = effective date) and appending the new current version
    — the warehouse pattern for keeping history instead of
    overwriting (Kimball SCD type 2).

    The changeset is deterministic: hash-bucket-0 customers (~10%) get
    a segment upgrade and an account credit. The whole apply is pure
    projections + one unionByName — NO join at all, because the
    changeset is derived from the target; with an external CDC feed
    the plan gains exactly one key join (see merge_upsert) and nothing
    else. History lives as rows, so downstream time-travel is a
    ``WHERE valid_from <= ts < valid_to`` filter that pushes down."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    changed = _bucket(F.col("c_custkey")) == 0
    eff = F.lit(_SCD2_EFFECTIVE).cast("timestamp")
    base_from = F.lit("1990-01-01").cast("timestamp")
    old_rows = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        base_from.alias("valid_from"),
        F.when(changed, eff).alias("valid_to"),
        F.when(changed, 0).otherwise(1).cast("long").alias("is_current"),
        F.lit(1).cast("long").alias("version"),
    )
    new_rows = cust.where(changed).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + F.lit(500.0)).alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(1).cast("long").alias("is_current"),
        F.lit(2).cast("long").alias("version"),
    )
    return old_rows.unionByName(new_rows)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the deterministic changeset to orders and return the merged
    table tagged with what happened to each row."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(orders, changeset(orders), "o_orderkey")
    action = (
        F.when(F.col("o_orderpriority") == "REPRICED", "updated")
        .when(F.col("o_orderpriority") == "BACKFILL", "inserted")
        .otherwise("kept")
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
        action.alias("merge_action"),
    )


from ..oracles import COMPACT_TARGET_CHARS  # noqa: E402  (single source of truth)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNER — the maintenance pass every
    100 TB table needs (streaming ingest and fine-grained partitions
    leave thousands of KB-sized files; scan cost is then dominated by
    per-file open/footer overhead, not bytes). Treats each document as
    an ingested small file (``n_chars`` = its size) and assigns files
    to compacted output bins per source: files are taken in the stable
    (source, doc_id) order and a file starts bin k when the bytes
    BEFORE it reach k × target — i.e. bin = floor(running_bytes_before
    / target), the contiguous-run analog of first-fit that a real
    compactor (Delta OPTIMIZE bin-packing) uses so it never reorders
    or splits files. Emits the per-bin manifest: file count, total
    bytes, and the id range to compact.

    All-integer arithmetic on a window prefix sum — exact, hash-
    verified. Scale: a per-source partitioned window (sources are the
    compaction unit); a deployment with few giant sources swaps in the
    range-exchange prefix sum corpus_to_sequences uses — same math,
    O(partitions) offset merge. The plan output is O(bins) ≪ O(files),
    and the rewrite it drives is an embarrassingly parallel per-bin
    coalesce."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    binned = docs.withColumn(
        "bin_id",
        F.floor(before / F.lit(COMPACT_TARGET_CHARS)).cast("long"),
    )
    return (
        binned.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )

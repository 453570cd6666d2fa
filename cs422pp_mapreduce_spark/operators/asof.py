"""As-of and range joins — time-series operators Spark lacks natively.

Both are implemented as compositions of existing DataFrame ops (the
SURVEY.md §4.4 rule: composition first, pandas UDF only if semantics
demand it):

- **as-of join**: the union-sort trick. Tag both sides, union, one
  window partitioned by the join key ordered by time, and
  ``last(value, ignorenulls)`` carries the most recent right-side row
  forward onto left-side rows. ONE shuffle on the key + per-partition
  sort — exactly the plan a purpose-built as-of join would pick, and it
  scales like any window aggregate (state is one row per partition
  cursor, not a buffered join side).
- **range join**: candidate generation by *time-bucket* equi-join
  (bucket width = range width, join on bucket and bucket+1), exact
  predicate afterwards. Turns a non-equi join Spark would nested-loop
  into a shuffle-hash join with bounded fan-out — the standard
  interval-join decomposition used by stream processors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry_cols: dict[str, str],
) -> DataFrame:
    """Generic as-of: for each left row, the latest right row with
    ``right_ts <= left_ts`` and equal key. ``carry_cols`` maps right
    column → output alias. Ties on timestamp resolve to the last row in
    (ts, original column order) — deterministic given unique right rows.
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    rt = right.withColumn("__t", F.col(right_ts)).withColumn(
        "__is_left", F.lit(0)
    )
    all_cols = set(lt.columns) | set(rt.columns)
    lt = lt.select(
        *[
            F.col(c) if c in lt.columns else F.lit(None).alias(c)
            for c in sorted(all_cols)
        ]
    )
    rt = rt.select(
        *[
            F.col(c) if c in rt.columns else F.lit(None).alias(c)
            for c in sorted(all_cols)
        ]
    )
    u = lt.unionByName(rt)
    # right rows sort before left rows at equal __t so `<=` holds; the
    # trailing sort keys make tie order among right rows deterministic
    tiebreaks = [c for c in sorted(carry_cols) if c != right_ts]
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__is_left", *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(src, ignorenulls=True).over(w).alias(dst)
            for src, dst in carry_cols.items()
        ],
    )
    return carried.where(F.col("__is_left") == 1).drop("__t", "__is_left")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's most recent order (o_custkey =
    user_id) at or before the event time — every event has matches
    since orders predate the event stream. DuckDB's native ASOF JOIN
    is the oracle."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("odate"),
        "o_orderkey",
    )
    out = asof_join(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="odate",
        carry_cols={"o_orderkey": "last_order_key", "odate": "last_order_date"},
    )
    return out.select(
        "event_id", "user_id", "ts", "last_order_key", "last_order_date"
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    width_seconds: int,
) -> DataFrame:
    """Candidate pairs with ``left_ts <= right_ts < left_ts + width``
    and equal key, via bucket-pair equi-join + exact filter."""
    w_us = width_seconds * 1_000_000  # microsecond precision throughout
    # cast: parquet NTZ timestamps (o_orderdate) vs TIMESTAMP — same
    # instant under the engine's UTC session timezone
    us_l = f"unix_micros(cast({left_ts} as timestamp))"
    us_r = f"unix_micros(cast({right_ts} as timestamp))"
    lb = left.withColumn("__lb", F.expr(f"{us_l} div {w_us}"))
    rb = right.withColumn("__rb", F.expr(f"{us_r} div {w_us}"))
    # a right row in [left_ts, left_ts+w) lives in the left row's bucket
    # or the next one
    lbx = lb.withColumn("__probe", F.explode(F.array(F.col("__lb"), F.col("__lb") + 1)))
    joined = lbx.join(rb, (lbx["__probe"] == rb["__rb"]) & (lbx[key] == rb[key]))
    return joined.where(
        (F.col(right_ts) >= F.col(left_ts))
        & (F.expr(us_r) < F.expr(us_l) + w_us)
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Follow-up activity: for each event, the user's other events in
    [ts, ts+30min) — a self range-join via bucket pairs. Output is
    per-anchor-event counts. The oracle is the plain inequality join."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", F.col("ts").alias("lts"),
                     F.col("event_id").alias("anchor_id"))
    right = ev.select("user_id", F.col("ts").alias("rts"),
                      F.col("event_id").alias("other_id"))
    pairs = range_join_bucketed(
        left, right, key="user_id", left_ts="lts", right_ts="rts",
        width_seconds=30 * 60,
    ).where(F.col("other_id") != F.col("anchor_id"))
    return pairs.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_followups"),
        F.min("other_id").alias("first_other_id"),
        F.max("other_id").alias("last_other_id"),
    )

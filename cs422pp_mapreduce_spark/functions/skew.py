"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the two cases AQE doesn't
cover: (a) skewed *aggregations* (one hot group key), and (b) skewed
joins against a side that can't broadcast. Both decompose one shuffle
on a hot key into `salt_buckets` sub-keys + a cheap second-stage merge.

The transformations are semantics-preserving for any distributive
aggregate (sum/count/min/max — and avg via sum+count); results are
identical to the unsalted plan (tests assert bit-equality for
decimal-routed sums).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets): hash of the whole
    row's monotonically-increasing id is NOT reproducible across runs,
    so salt on spark_partition_id + a per-partition row counter is
    avoided too — instead hash existing columns (cheap, stable)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(col_name, F.pmod(h, F.lit(buckets)))


# merge functions for the two-stage decomposition: how stage-2 combines
# stage-1 partials. Only distributive aggregates belong here — avg and
# friends must be decomposed by the caller (sum+count).
_MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_cols: dict[str, tuple[Column, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: stage 1 aggregates on
    (group_cols + salt) — spreading a hot key over `buckets` reducers —
    stage 2 merges the partials on group_cols alone.

    ``agg_cols`` maps output name → (stage-1 aggregate expression,
    merge kind), where merge kind is one of ``sum | count | min | max``
    — stated explicitly by the caller rather than inferred from private
    JVM expression handles (which breaks under Spark Connect and would
    silently mis-merge non-distributive aggregates like avg).
    """
    salted = with_salt(df, buckets)
    stage1 = salted.groupBy(*group_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in agg_cols.items()]
    )
    merges = []
    for name, (_, kind) in agg_cols.items():
        if kind not in _MERGE_FNS:
            raise ValueError(
                f"unsupported merge kind {kind!r} for {name!r}; "
                f"supported: {sorted(_MERGE_FNS)} (decompose avg as sum+count)"
            )
        merges.append(_MERGE_FNS[kind](F.col(f"__p_{name}")).alias(name))
    return stage1.groupBy(*group_cols).agg(*merges)


def salted_join_small_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join when `small` is modest but above broadcast
    size: salt the big side, replicate the small side across all salt
    values, join on (key, salt). One shuffle each side; the hot key's
    rows land on `buckets` different reducers instead of one."""
    big_s = with_salt(big, buckets)
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return big_s.join(small_r, on=[key, "__salt"]).drop("__salt")

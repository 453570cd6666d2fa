"""Physical-plan inspection helpers.

The reference's physical strategy was fixed at compile time (SURVEY.md
§4); ours is chosen by Catalyst — so the engine's "physical tests"
assert on the *plan*: filters reached the scan, small dims broadcast,
aggregates have partial phases, no accidental extra shuffles. These
helpers give tests and the bench a stable string surface for that.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan.
    Counts Exchange nodes (formatted mode lists them as numbered node
    names); BroadcastExchange is excluded — broadcasts are the point."""
    plan = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of the scan nodes ('' if none)."""
    plan = explain_str(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PushedFilters" in line
    )


def partial_agg_count(df: DataFrame) -> int:
    """Count of partial-aggregate phases (map-side combine evidence)."""
    plan = explain_str(df)
    return len(re.findall(r"partial_", plan))

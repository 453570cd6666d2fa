"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent, and a distributed engine never
guarantees accumulation order — so cross-engine verification (and
re-runs at different parallelism!) of double sums is inherently flaky.
The engine's rule (SURVEY.md §7 "float hashing"): route money/measure
sums through DECIMAL, which is exact and therefore partitioning- and
engine-independent, then surface DOUBLE for a friendly schema.

The inputs here are 2-decimal business values stored as double; casting
to DECIMAL(18, 4+) recovers the exact intended value, the decimal SUM is
exact, and the final cast back to double is exact for |x| < 2^53/1e4.
This mirrors what production TPC-H schemas do (DECIMAL columns) without
rewriting the driver-provided parquet.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Order-independent SUM of a fixed-point-valued double column."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """AVG as exact-decimal SUM divided by COUNT (one double division —
    bit-identical across engines given identical inputs)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def oracle_exact_sum(expr: str, scale: int = 4) -> str:
    """DuckDB SQL text equivalent of ``exact_sum`` for oracle queries."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oracle_exact_avg(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
    )

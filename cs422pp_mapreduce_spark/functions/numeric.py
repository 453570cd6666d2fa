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


# --- exact-decimal money products (round 5) ---------------------------
#
# Casting a DOUBLE PRODUCT to decimal is engine-dependent at .5
# rounding boundaries: Spark rounds HALF_UP on the double's shortest
# decimal repr (BigDecimal.valueOf), DuckDB rounds the binary value —
# observed as a half-ulp sum_charge divergence on exactly 1 row in 6 M
# at the r05 sf1 gate (tpch_q1). The INPUTS are 2-decimal business
# values whose double→decimal conversion IS boundary-safe (the
# shortest repr is the 2-decimal literal itself, identically in both
# engines); converting the inputs first and multiplying in decimal
# arithmetic keeps every intermediate exact, so both engines produce
# the IDENTICAL decimal sum. Precisions are chosen so no product ever
# hits Spark's 38-digit cap (no precision-loss rescaling): price
# (12,2) × (1−disc) (5,2) → (18,4); × (1+tax) (5,2) → (24,6).
# The oracle-side twins live in oracles.py (_DISC_PRICE/_CHARGE/
# _DISC_REV), same precisions.


def money_dec(col: Column | str) -> Column:
    """Exact decimal form of a 2-decimal money double (≤ 10^10)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def _rate_dec(col: Column | str) -> Column:
    """Exact decimal form of a 2-decimal rate double (discount/tax)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(4,2)")


def disc_price_dec(
    price: Column | str = "l_extendedprice",
    disc: Column | str = "l_discount",
) -> Column:
    """price × (1 − disc) in exact decimal arithmetic → decimal(18,4)."""
    return money_dec(price) * (
        F.lit(1).cast("decimal(4,2)") - _rate_dec(disc)
    )


def charge_dec(
    price: Column | str = "l_extendedprice",
    disc: Column | str = "l_discount",
    tax: Column | str = "l_tax",
) -> Column:
    """price × (1 − disc) × (1 + tax) exactly → decimal(24,6)."""
    return disc_price_dec(price, disc) * (
        F.lit(1).cast("decimal(4,2)") + _rate_dec(tax)
    )


def disc_rev_dec(
    price: Column | str = "l_extendedprice",
    disc: Column | str = "l_discount",
) -> Column:
    """price × disc exactly → decimal(16,4) (the TPC-H Q6 shape)."""
    return money_dec(price) * _rate_dec(disc)


def oracle_exact_sum(expr: str, scale: int = 4) -> str:
    """DuckDB SQL text equivalent of ``exact_sum`` for oracle queries."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oracle_exact_avg(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
    )

"""TPC-H-shaped benchmark queries over the synthetic star schema.

The classic shapes (Q3 shipping-priority, Q5 local-supplier volume,
Q6 forecast-revenue, Q10 returned-items) adapted to the fixture schema
(FIXTURES.md §B: no o_shippriority, synthetic nation names). These are
the canonical multi-join + selective-predicate + top-k patterns an
analytics engine is judged on; all follow the engine's determinism
conventions so each has an exact DuckDB oracle.

Scale notes: every query is fully declarative — date predicates push to
the scans, dims broadcast, aggregates are partial→final, top-k is
TakeOrderedAndProject. No hints beyond `broadcast()` on true dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum
from ..sources.catalog import load_table


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: top-10 open orders by potential revenue for one
    market segment."""
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-03-15")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-03-15")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation within one region where the
    supplier and customer share a nation (local supply)."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("2000-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
            )
        )
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: forecast revenue change — a pure scan-filter-agg whose
    predicates must ALL reach the parquet reader."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1999-01-01"))
            & (F.col("l_shipdate") < F.lit("2000-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy()
        .agg(
            exact_sum(
                F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share for one ship month. Conditional
    aggregation over a broadcast dim join; both sums decimal-routed and
    the percentage is one double expression so the result is
    bit-stable."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1999-09-01"))
        & (F.col("l_shipdate") < F.lit("1999-10-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = (
        F.sum(
            F.when(F.col("p_type") == "PROMO", rev)
            .otherwise(F.lit(0.0))
            .cast("decimal(18,4)")
        ).cast("double")
    )
    total_rev = F.sum(rev.cast("decimal(18,4)")).cast("double")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy()
        .agg(
            (F.lit(100.0) * promo_rev / total_rev).alias("promo_pct"),
            total_rev.alias("total_revenue"),
        )
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: large-volume customers — orders whose total quantity
    exceeds a threshold, with customer attribution. The aggregate-then-
    join order matters at scale: the heavy lineitem aggregation reduces
    to one row per qualifying order BEFORE any join, so the joins move
    ~1% of the data."""
    threshold = 250
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity", 2, "sum_qty"))
        .where(F.col("sum_qty") > threshold)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by lost revenue from returned items
    in one quarter."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1999-10-01"))
        & (F.col("o_orderdate") < F.lit("2000-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )

"""DuckDB oracle SQL for every verifiable query (SURVEY.md §2.3).

One string per ``queries()`` key, runnable by DuckDB 1.0.0 against
views named region/nation/customer/supplier/part/orders/lineitem/
events/documents/embeddings. Column names and types must match the
Spark output exactly (driver hashes values under name-sorted columns).

Conventions shared with the Spark side:
- money/measure sums: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) —
  exact, order-independent (functions/numeric.py rationale);
- avg: exact-decimal sum / COUNT (single double division);
- rank/length/year/... cast to BIGINT to match Spark's long;
- top-k always carries a unique tiebreaker in ORDER BY.
"""

from __future__ import annotations


def _xsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def _xavg(expr: str, scale: int = 4) -> str:
    return f"{_xsum(expr, scale)} / COUNT({expr})"


ORACLES: dict[str, str] = {
    # --- wordcount family -------------------------------------------------
    "wordcount": """
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    """,
    # --- scans / filters --------------------------------------------------
    "scan_project": """
        SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem
    """,
    "filter_pred": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
        WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
    # --- aggregation ------------------------------------------------------
    "group_agg": f"""
        SELECT l_returnflag, l_linestatus,
               {_xsum('l_quantity', 2)} AS sum_qty,
               {_xsum('l_extendedprice', 2)} AS sum_base_price,
               {_xsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
               {_xavg('l_quantity', 2)} AS avg_qty,
               {_xavg('l_extendedprice', 2)} AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "count_distinct": """
        SELECT l_suppkey,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_items
        FROM lineitem GROUP BY l_suppkey
    """,
    "rollup_agg": f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               {_xsum('l_quantity', 2)} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               {_xsum('l_extendedprice', 2)} AS sum_price
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "case_expr": f"""
        SELECT CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 30 THEN 'medium'
                    ELSE 'large' END AS qty_bucket,
               COUNT(*) AS n_rows,
               {_xsum('l_extendedprice', 2)} AS sum_price
        FROM lineitem GROUP BY 1
    """,
    # --- joins ------------------------------------------------------------
    "hash_join": """
        SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "broadcast_join": """
        SELECT s_suppkey, s_name, n_name, r_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "multi_join_agg": f"""
        SELECT n_name,
               {_xsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    "anti_join": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "outer_join": """
        SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    # --- set operations ---------------------------------------------------
    "union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "except_op": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "intersect_op": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    # --- sort / top-k -----------------------------------------------------
    "topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    # --- window functions -------------------------------------------------
    "window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   RANK() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders)
        WHERE rnk <= 3
    """,
    "window_running": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_total
        FROM orders
    """,
    "window_lag": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               LAG(o_totalprice) OVER w AS prev_price,
               o_totalprice - LAG(o_totalprice) OVER w AS price_delta
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    # --- scalar functions -------------------------------------------------
    "string_funcs": """
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LENGTH(p_name) AS name_len,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               p_brand || '#' || p_type AS brand_type
        FROM part
    """,
    "date_funcs": f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS oyear,
               CAST(month(o_orderdate) AS BIGINT) AS omonth,
               COUNT(*) AS n_orders,
               {_xsum('o_totalprice', 2)} AS month_revenue
        FROM orders GROUP BY 1, 2
    """,
}

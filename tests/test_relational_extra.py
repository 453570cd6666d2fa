"""Extra relational semantics: sketch error bounds, pivot totals,
grouping-set row accounting."""

from __future__ import annotations

from cs422pp_mapreduce_spark.operators import relational as R
from cs422pp_mapreduce_spark.operators import sqlsurface as SQ


def test_approx_agg_error_bounded(spark, sf_dir):
    exact_by_flag = {
        r["l_returnflag"]: r["exact_parts"]
        for r in R.q_exact_distinct_agg(spark, sf_dir).collect()
    }
    for r in R.q_approx_agg(spark, sf_dir).collect():
        exact, approx = exact_by_flag[r["l_returnflag"]], r["approx_parts"]
        assert abs(approx - exact) <= max(3, 0.1 * exact)
        assert r["approx_median_price"] > 0


def test_pivot_counts_sum_to_total(spark, sf_dir):
    rows = SQ.q_pivot_status(spark, sf_dir).collect()
    total = sum(r["n_F"] + r["n_O"] + r["n_P"] for r in rows)
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    assert total == load_table(spark, sf_dir, "orders").count()


def test_grouping_sets_row_accounting(spark, sf_dir):
    rows = SQ.q_grouping_sets(spark, sf_dir).collect()
    # (flag), (status), (flag,status): the (flag,status) set's n_rows
    # must sum to the same total as the (flag)-only set's
    by_gid: dict[int, int] = {}
    for r in rows:
        by_gid[r["gid"]] = by_gid.get(r["gid"], 0) + r["n_rows"]
    assert by_gid[0] == by_gid[1] == by_gid[2]  # each set covers all rows
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

def test_kll_quantiles_bounds_and_merge_bookkeeping(spark, sf_dir):
    """KLL sketch contract: (a) per-group n_rows is exact; (b) the
    __all__ row's n_rows equals the group total (the merged sketch
    covers exactly the union of rows); (c) every estimated quantile's
    TRUE rank is within a generous ε=5% of its target rank (KLL k=200
    guarantees ~1.65% normalized rank error w.h.p.); (d) quantile
    estimates are actual data values (KLL returns order statistics,
    not interpolations)."""
    from cs422pp_mapreduce_spark.operators.relational import (
        KLL_PROBS,
        q_kll_quantiles,
    )
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    out = {
        r["o_orderpriority"]: r
        for r in q_kll_quantiles(spark, sf_dir).collect()
    }
    ords = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .toPandas()
    )
    assert out["__all__"]["n_rows"] == len(ords)
    values = {g: sorted(sub["o_totalprice"]) for g, sub in ords.groupby("o_orderpriority")}
    values["__all__"] = sorted(ords["o_totalprice"])
    for g, xs in values.items():
        assert out[g]["n_rows"] == len(xs)
        for p in KLL_PROBS:
            est = out[g][f"p{int(p * 100)}"]
            assert est in set(xs), "estimate must be a data value"
            # true normalized rank of the estimate
            import bisect
            rank = bisect.bisect_right(xs, est) / len(xs)
            assert abs(rank - p) <= 0.05, (g, p, est, rank)

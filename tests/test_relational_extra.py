"""Extra relational semantics: sketch error bounds, pivot totals,
grouping-set row accounting."""

from __future__ import annotations

from cs422pp_mapreduce_spark.operators import relational as R
from cs422pp_mapreduce_spark.operators import sqlsurface as SQ


def test_approx_agg_error_bounded(spark, sf_dir):
    """r09 bound-contract shape: the exact side must agree with the
    exact twin query, and both sketch-contract booleans must hold."""
    exact_by_flag = {
        r["l_returnflag"]: r["exact_parts"]
        for r in R.q_exact_distinct_agg(spark, sf_dir).collect()
    }
    rows = R.q_approx_agg(spark, sf_dir).collect()
    assert {r["l_returnflag"] for r in rows} == set(exact_by_flag)
    for r in rows:
        assert r["exact_parts"] == exact_by_flag[r["l_returnflag"]]
        assert r["distinct_within_bound"] is True
        assert r["median_within_bound"] is True


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
    """KLL sketch contract (r09 bound-contract shape): (a) per-group
    n_rows is exact; (b) the __all__ row's n_rows equals the group
    total (the merged sketch covers exactly the union of rows);
    (c) every per-rank contract boolean holds — i.e. each learned
    quantile's TRUE rank is within KLL_RANK_EPS of its target (the
    published k=200 guarantee is ~1.65% w.h.p.; the contract allows
    2.1×). The quantile VALUES no longer ship (run-specific —
    compaction is randomized), so the rank check lives inside the
    query and this test asserts the booleans plus bookkeeping."""
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
    sizes = {
        g: len(sub) for g, sub in ords.groupby("o_orderpriority")
    }
    assert sum(sizes.values()) == out["__all__"]["n_rows"]
    for g, r in out.items():
        if g != "__all__":
            assert r["n_rows"] == sizes[g]
        for p in KLL_PROBS:
            assert r[f"p{int(p * 100)}_ok"] is True, (g, p)

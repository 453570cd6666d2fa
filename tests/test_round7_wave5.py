"""Round-7 wave-5 operators: corr_matrix, bloom_semi_join,
stream_sliding.

Replica pins beside the DuckDB oracle gate: NumPy corrcoef, a
pure-Python bloom replay (no-false-negatives + the md5 position
convention), and batch-equals-stream for the sliding contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.operators import events as EV
from cs422pp_mapreduce_spark.operators import relational as R


# --- corr_matrix -----------------------------------------------------------


def test_corr_matrix_matches_numpy(spark, sf_dir):
    rows = R.q_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .toPandas()
    )
    cols = {
        "quantity": li.l_quantity.to_numpy(),
        "extendedprice": li.l_extendedprice.to_numpy(),
        "discount": li.l_discount.to_numpy(),
        "tax": li.l_tax.to_numpy(),
    }
    for r in rows:
        want = np.corrcoef(cols[r["var_x"]], cols[r["var_y"]])[0, 1]
        assert r["corr_xy"] == pytest.approx(want, rel=1e-9)
        assert r["n_rows"] == len(li)
        assert -1.0 <= r["corr_xy"] <= 1.0


# --- bloom_semi_join -------------------------------------------------------


def _pos(key: int, i: int) -> int:
    h = hashlib.md5(f"{key}:{i}".encode()).hexdigest()
    return int(h[:15], 16) % R.BLOOM_M


def test_bloom_semi_join_census(spark, sf_dir):
    out = {r["l_returnflag"]: r for r in R.q_bloom_semi_join(spark, sf_dir).collect()}
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .toPandas()
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_returnflag")
        .toPandas()
    )
    sel = set(orders[orders.o_orderpriority == "1-URGENT"].o_orderkey)
    bits = {
        _pos(k, i) for k in sel for i in range(R.BLOOM_K)
    }
    for flag, g in li.groupby("l_returnflag"):
        n_pass = n_match = 0
        for k in g.l_orderkey:
            passed = all(_pos(k, i) in bits for i in range(R.BLOOM_K))
            match = k in sel
            n_pass += passed
            n_match += match
            # the defining bloom property: NO false negatives
            assert passed or not match
        row = out[flag]
        assert row["n_probe"] == len(g)
        assert row["n_bloom_pass"] == n_pass
        assert row["n_match"] == n_match
        assert row["n_false_pos"] == n_pass - n_match


def test_bloom_plan_twin_schema_matches(spark, sf_dir):
    from cs422pp_mapreduce_spark.plans.analysis import bloom_semi_join_plan

    real = R.q_bloom_semi_join(spark, sf_dir)
    twin = bloom_semi_join_plan(spark, sf_dir)
    assert [(f.name, f.dataType) for f in real.schema.fields] == [
        (f.name, f.dataType) for f in twin.schema.fields
    ]


# --- stream_sliding --------------------------------------------------------


def test_stream_sliding_equals_batch(spark, sf_dir):
    from cs422pp_mapreduce_spark.streaming.events import q_stream_sliding

    got = {
        (r["win_start"], r["n_events"], r["sum_value"])
        for r in q_stream_sliding(spark, sf_dir).collect()
    }
    want = {
        (r["win_start"], r["n_events"], r["sum_value"])
        for r in EV.q_event_sliding(spark, sf_dir).collect()
    }
    assert got == want

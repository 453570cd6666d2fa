"""Round-11 operators: the ANN recall contract, suffix-array dedup,
and streaming late-data accounting."""

from __future__ import annotations

import pytest


def test_ann_recall_report_contract(spark, sf_dir):
    """The recall report composes only hash-verified components, so
    its invariants are structural: one row per index, den = K per
    query, num <= den, exact-metric recall in [0, 1], and IVF/PQ
    (which re-rank with the true metric over candidate supersets of
    size >= K) must beat the bucket-limited LSH on the uniform-random
    fixture where LSH bands rarely agree."""
    from cs422pp_mapreduce_spark.operators.similarity import (
        TOP_K,
        q_ann_recall_report,
    )
    from cs422pp_mapreduce_spark.oracles import KNN_Q

    rows = {r["index_name"]: r for r in q_ann_recall_report(spark, sf_dir).collect()}
    assert sorted(rows) == ["ivf", "lsh", "pq"]
    for r in rows.values():
        assert r["n_queries"] == KNN_Q
        assert r["recall_den"] == KNN_Q * TOP_K
        assert 0 <= r["recall_num"] <= r["recall_den"]
        assert abs(r["recall"] - round(r["recall_num"] / r["recall_den"], 4)) < 1e-12
    assert rows["ivf"]["recall_num"] > rows["lsh"]["recall_num"]
    assert rows["pq"]["recall_num"] > rows["lsh"]["recall_num"]


def test_ann_recall_matches_duckdb_oracle(spark, sf_dir):
    """Driver-style: Spark result == the composed DuckDB oracle."""
    import duckdb

    from cs422pp_mapreduce_spark.operators.similarity import (
        q_ann_recall_report,
    )
    from cs422pp_mapreduce_spark.oracles import ORACLES

    got = sorted(
        tuple(r) for r in q_ann_recall_report(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(ORACLES["ann_recall_report"]).fetchall())
    assert got == want

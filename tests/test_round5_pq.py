"""Product quantization: codebook/code invariants, ADC fidelity,
recall vs the exact scan, determinism.

The recall test runs at the ORACLE scale (500 vectors) so the ADC
shortlist (40) actually prunes; at the smoke scale it would cover
most of the table and prove nothing."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.sources.catalog import load_table
from tests.conftest import SF_ORACLE


def _exact_l2_topk(spark, sf_dir, k=10):
    from cs422pp_mapreduce_spark.operators.similarity import (
        QUERY_VEC_ID,
        _as_double,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("arr")
    )
    rows = emb.collect()
    q = next(np.array(r["arr"]) for r in rows if r["vec_id"] == QUERY_VEC_ID)
    dists = sorted(
        (float(np.sum((np.array(r["arr"]) - q) ** 2)), r["vec_id"])
        for r in rows
        if r["vec_id"] != QUERY_VEC_ID
    )
    return [v for _, v in dists[:k]]


def test_pq_codes_shape_and_range(spark, sf_dir):
    from cs422pp_mapreduce_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        build_pq_index,
    )

    books, codes = build_pq_index(spark, sf_dir)
    assert len(books) == PQ_M and all(len(b) == PQ_K for b in books)
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert codes.count() == n_vecs * PQ_M  # 8 codes per vector
    bad = codes.where(
        (F.col("code") < 0) | (F.col("code") >= PQ_K)
    ).count()
    assert bad == 0
    # compression really happened: distinct codes per subspace ≤ PQ_K
    per_m = (
        codes.groupBy("m")
        .agg(F.countDistinct("code").alias("n"))
        .collect()
    )
    assert all(1 <= r["n"] <= PQ_K for r in per_m)


def test_pq_adc_matches_reconstruction_distance(spark, sf_dir):
    """The ADC identity: summing per-subspace LUT entries for a
    vector's codes equals the exact distance from the query to that
    vector's codebook reconstruction — verified in numpy against the
    trained index, independent of the Spark fold."""
    from cs422pp_mapreduce_spark.operators.similarity import (
        PQ_DSUB,
        PQ_M,
        QUERY_VEC_ID,
        _as_double,
        build_pq_index,
    )

    books, codes = build_pq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("arr")
    )
    q = np.array(
        emb.where(F.col("vec_id") == QUERY_VEC_ID).collect()[0]["arr"]
    )
    sample = codes.where(F.col("vec_id") < 5).collect()
    by_vec: dict[int, dict[int, int]] = {}
    for r in sample:
        by_vec.setdefault(r["vec_id"], {})[r["m"]] = r["code"]
    for vid, cmap in by_vec.items():
        assert len(cmap) == PQ_M
        recon = np.concatenate(
            [np.array(books[m][cmap[m]]) for m in range(PQ_M)]
        )
        adc = sum(
            float(
                np.sum(
                    (
                        q[m * PQ_DSUB : (m + 1) * PQ_DSUB]
                        - np.array(books[m][cmap[m]])
                    )
                    ** 2
                )
            )
            for m in range(PQ_M)
        )
        assert abs(adc - float(np.sum((q - recon) ** 2))) < 1e-9


def test_pq_output_is_exact_distance_on_shortlist(spark, sf_dir):
    """The re-ranked output's l2_dist is the TRUE squared distance
    (pinned against numpy), and rows come back sorted."""
    from cs422pp_mapreduce_spark.operators.similarity import (
        QUERY_VEC_ID,
        _as_double,
        q_ann_pq,
    )

    top = q_ann_pq(spark, sf_dir).collect()
    assert len(top) == 10
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("arr")
    )
    arrs = {r["vec_id"]: np.array(r["arr"]) for r in emb.collect()}
    q = arrs[QUERY_VEC_ID]
    dists = [r["l2_dist"] for r in top]
    assert dists == sorted(dists)
    for r in top:
        want = float(np.sum((arrs[r["vec_id"]] - q) ** 2))
        assert abs(r["l2_dist"] - want) < 1e-5


def test_pq_recall_vs_exact_at_oracle_scale(spark):
    """ADC shortlist (40 of 500) + exact re-rank recovers most of the
    exact L2 top-10 — on uniform random vectors, PQ's worst case."""
    from cs422pp_mapreduce_spark.operators.similarity import q_ann_pq

    got = [r["vec_id"] for r in q_ann_pq(spark, SF_ORACLE).collect()]
    exact = _exact_l2_topk(spark, SF_ORACLE, 10)
    overlap = len(set(got) & set(exact))
    assert overlap >= 6


def test_pq_deterministic(spark, sf_dir):
    from cs422pp_mapreduce_spark.operators.similarity import q_ann_pq

    a = [tuple(r) for r in q_ann_pq(spark, sf_dir).collect()]
    b = [tuple(r) for r in q_ann_pq(spark, sf_dir).collect()]
    assert a == b

"""Round-7 wave-3 operators: sssp, ewma_smooth, cluster_silhouette.

Each gets an independent driver-side replica pin (the engine's test
convention beside the DuckDB oracle gate): pure-Python Bellman-Ford,
a pure-Python EWMA fold, and a NumPy quantized-silhouette twin.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.operators import events as EV
from cs422pp_mapreduce_spark.operators import graph as GR
from cs422pp_mapreduce_spark.operators import similarity as S


def test_sssp_matches_python_bellman_ford(spark, sf_dir):
    ew = GR.weighted_edges(spark, sf_dir).collect()
    edges = []
    for r in ew:
        edges.append((r["cust"], r["supp"], r["w"]))
        edges.append((r["supp"], r["cust"], r["w"]))
    src = min(r["cust"] for r in ew)
    dist = {src: 0}
    for _ in range(GR.SSSP_ROUNDS):
        nxt = dict(dist)
        for a, b, w in edges:
            if a in dist and dist[a] + w < nxt.get(b, math.inf):
                nxt[b] = dist[a] + w
        dist = nxt
    got = {r["node"]: r["dist"] for r in GR.q_sssp(spark, sf_dir).collect()}
    assert got == dist


def test_sssp_distances_are_exact_ints_and_source_zero(spark, sf_dir):
    rows = GR.q_sssp(spark, sf_dir).collect()
    assert min(r["dist"] for r in rows) == 0
    src = min(
        r["cust"] for r in GR.weighted_edges(spark, sf_dir).collect()
    )
    by_node = {r["node"]: r["dist"] for r in rows}
    assert by_node[src] == 0
    assert all(isinstance(r["dist"], int) for r in rows)


def test_ewma_matches_python_fold(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    expected = {}
    a, b = EV.EWMA_ALPHA, 1.0 - EV.EWMA_ALPHA
    for uid, rows in seqs.items():
        xs = [x for _, _, x in sorted(rows)]
        s = xs[0]
        for x in xs[1:]:
            s = s * b + x * a  # same op order as the engine fold
        expected[uid] = (len(xs), s)
    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in EV.q_ewma_smooth(spark, sf_dir).collect()
    }
    assert got.keys() == expected.keys()
    for uid in expected:
        assert got[uid][0] == expected[uid][0]
        assert got[uid][1] == expected[uid][1]  # bit-exact, no approx


def test_cluster_silhouette_matches_numpy_replica(spark, sf_dir):
    centroids, assigned = S.build_ivf_index(spark, sf_dir)
    C = np.asarray(centroids)
    rows = assigned.select("vec_id", "arr", "cell").collect()
    per_cell: dict[int, list[float]] = {}
    for r in rows:
        v = np.asarray(r["arr"])
        d2q = [
            sum(
                int(math.floor((x - c) * (x - c) * 1e15))
                for x, c in zip(v, C[cell])
            )
            for cell in range(len(C))
        ]
        a = d2q[r["cell"]]
        b = min(d for cell, d in enumerate(d2q) if cell != r["cell"])
        sil = 0.0 if max(a, b) == 0 else float(b - a) / float(max(a, b))
        per_cell.setdefault(r["cell"], []).append(sil)
    expected = {
        cell: (
            len(sils),
            float(sum(int(math.floor(s * 1e15)) for s in sils))
            / 1e15
            / len(sils),
        )
        for cell, sils in per_cell.items()
    }
    got = {
        r["cell"]: (r["n"], r["mean_sil"])
        for r in S.q_cluster_silhouette(spark, sf_dir).collect()
    }
    assert got.keys() == expected.keys()
    for cell in expected:
        assert got[cell][0] == expected[cell][0]
        assert got[cell][1] == pytest.approx(expected[cell][1], abs=0)


def test_cluster_silhouette_bounds(spark, sf_dir):
    rows = S.q_cluster_silhouette(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["mean_sil"] <= 1.0
        assert r["n"] >= 1


def test_ewma_single_event_user_is_identity(spark):
    # s_0 = first value: a single-event user's EWMA is exactly its value
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 100, 7.5)],
        "user_id long, ts string, event_id long, value double",
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "value",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        out = EV.q_ewma_smooth(df.sparkSession, td).collect()
    assert len(out) == 1
    assert out[0]["ewma"] == 7.5
    assert out[0]["n_events"] == 1


def test_stream_ewma_equals_batch_twin(spark, sf_dir):
    # The converged incremental state must equal the batch fold
    # BIT-FOR-BIT (same IEEE expression per step, same (ts, event_id)
    # fold order across the staged micro-batch boundaries).
    from cs422pp_mapreduce_spark.streaming.stateful import q_stream_ewma

    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in q_stream_ewma(spark, sf_dir).collect()
    }
    exp = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in EV.q_ewma_smooth(spark, sf_dir).collect()
    }
    assert got == exp

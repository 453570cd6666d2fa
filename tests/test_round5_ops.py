"""Round-5 wave-2 operators: BM25 retrieval, triangle counting,
deterministic training shards.

Correctness cross-engine equality is the oracle gate's job
(tools/check_oracles.py); these tests pin the things the gate cannot:
plan shape (map-only scoring, TakeOrdered top-k, no explode), exact
agreement with independent brute-force Python replicas, and the
invariants (partition of the corpus, orientation independence) the
algorithms rely on.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow.parquet as pq

from cs422pp_mapreduce_spark.operators import corpus as CP
from cs422pp_mapreduce_spark.operators import graph as GR
from cs422pp_mapreduce_spark.operators import textops as TX
from cs422pp_mapreduce_spark.oracles import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
    N_SHARDS,
)
from cs422pp_mapreduce_spark.plans.explain import explain_str


def _bm25_replica(sf_dir: str) -> pd.DataFrame:
    """Independent row-at-a-time BM25 replica over the raw parquet."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    toks = docs["text"].map(lambda t: [w for w in t.split(" ") if w != ""])
    dl = toks.map(len)
    n, avgdl = len(docs), float(dl.sum()) / len(docs)
    rows = []
    tf_all = {
        t: toks.map(lambda ws, t=t: sum(1 for w in ws if w == t))
        for t in BM25_TERMS
    }
    df_all = {t: int((tf_all[t] > 0).sum()) for t in BM25_TERMS}
    for i in range(len(docs)):
        score = 0.0
        for t in BM25_TERMS:
            tf, df = float(tf_all[t].iat[i]), df_all[t]
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += (
                idf
                * tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl.iat[i] / avgdl))
            )
        rows.append((int(docs["doc_id"].iat[i]), round(score, 6) + 0.0))
    rep = pd.DataFrame(rows, columns=["doc_id", "score"])
    rep = rep[rep["score"] > 0].sort_values(
        ["score", "doc_id"], ascending=[False, True]
    )
    return rep.head(BM25_TOPK).reset_index(drop=True)


def test_bm25_matches_python_replica(spark, sf_dir):
    got = (
        TX.q_bm25_topk(spark, sf_dir)
        .select("doc_id", "score")
        .toPandas()
        .reset_index(drop=True)
    )
    want = _bm25_replica(sf_dir)
    # replica uses the same fixed op order ⇒ doubles identical post-round
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bm25_plan_is_map_only_scoring(spark, sf_dir):
    plan = explain_str(TX.q_bm25_topk(spark, sf_dir))
    # no per-token explode/shuffle: scoring is within-row array math
    assert "Generate" not in plan  # explode's physical node
    assert "BatchEvalPython" not in plan
    # global top-k must be heap-based, never a global sort
    assert "TakeOrderedAndProject" in plan


def _brute_triangles(sf_dir: str) -> tuple[int, int, int]:
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    adj: dict[int, set[int]] = {}
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in grp["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    n_nodes = len(adj)
    n_edges = sum(len(s) for s in adj.values()) // 2
    tri = 0
    for u, nbrs in adj.items():
        for v in nbrs:
            if v > u:
                tri += len([w for w in adj[u] & adj[v] if w > v])
    return n_nodes, n_edges, tri


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    row = GR.q_triangle_count(spark, sf_dir).collect()[0]
    n_nodes, n_edges, tri = _brute_triangles(sf_dir)
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (
        n_nodes,
        n_edges,
        tri,
    )
    assert tri > 0  # fixture actually exercises the closing join


def test_training_shards_partition_and_order(spark, sf_dir):
    got = CP.q_training_shards(spark, sf_dir).toPandas()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).to_pandas()
    # shards partition the corpus exactly
    assert int(got["n_docs"].sum()) == len(docs)
    assert got["shard_id"].between(0, N_SHARDS - 1).all()
    assert got["shard_id"].is_unique
    # first_doc is the doc whose md5 is the shard's minimum (permutation
    # order), i.e. first_hash is md5(first_doc)
    import hashlib

    md5 = got["first_doc"].map(
        lambda d: hashlib.md5(str(int(d)).encode()).hexdigest()
    )
    assert (md5 == got["first_hash"]).all()


def test_training_shards_deterministic(spark, sf_dir):
    a = CP.q_training_shards(spark, sf_dir).toPandas()
    b = CP.q_training_shards(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(a, b)

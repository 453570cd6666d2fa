"""Round-7 wave-7 operators: stratified_split, negative_sampling,
decay_agg.

Replica pins: exact per-stratum ratio arithmetic, ring-arithmetic
negative positions replayed in pure Python, and an exact-fraction
decay recomputation.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import numpy as np
import pytest

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.operators import textops as TX


def test_stratified_split_ratios_exact(spark, sf_dir):
    rows = TX.q_stratified_split(spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang", "source")
        .count()
        .collect()
    )
    strata = {(r["lang"], r["source"]): r["count"] for r in docs}
    got = {}
    for r in rows:
        got.setdefault((r["lang"], r["source"]), {})[r["split"]] = r["n_docs"]
    assert set(got) == set(strata)
    for key, n in strata.items():
        parts = got[key]
        assert sum(parts.values()) == n
        # exact integer cuts: train = floor(8n/10), train+val = floor(9n/10)
        train = 8 * n // 10
        val = 9 * n // 10 - train
        assert parts.get("train", 0) == train
        assert parts.get("val", 0) == val
        assert parts.get("test", 0) == n - train - val


def test_stratified_split_deterministic(spark, sf_dir):
    a = sorted(map(tuple, TX.q_stratified_split(spark, sf_dir).collect()))
    b = sorted(map(tuple, TX.q_stratified_split(spark, sf_dir).collect()))
    assert a == b


def test_negative_sampling_ring_positions(spark, sf_dir):
    out = TX.q_negative_sampling(spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    rank = {}
    lang_of = {}
    n_of = {}
    for lang, ids in by_lang.items():
        ids.sort(
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        for pos, d in enumerate(ids, 1):
            rank[d] = pos
            lang_of[d] = lang
        n_of[lang] = len(ids)
    want = set()
    for d in rank:
        n = n_of[lang_of[d]]
        ids = by_lang[lang_of[d]]
        for i in range(1, TX.NEG_K + 1):
            tr = (rank[d] - 1 + i * TX.NEG_STEP) % n + 1
            neg = ids[tr - 1]
            if neg != d:
                want.add((d, i, neg))
    got = {(r["anchor_id"], r["i"], r["neg_id"]) for r in out}
    assert got == want
    # negatives share the anchor's language and never equal the anchor
    for d, i, neg in got:
        assert lang_of[neg] == lang_of[d]
        assert neg != d


def test_decay_agg_matches_exact_fractions(spark, sf_dir):
    out = {r["event_type"]: r for r in TX.q_decay_agg(spark, sf_dir).collect()}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", F.to_date("ts").alias("day"), "value")
        .toPandas()
    )
    max_day = ev.day.max()
    for et, g in ev.groupby("event_type"):
        # to_date collects as datetime.date objects — subtract directly
        ages = [min((max_day - d).days, 30) for d in g.day]
        w = [1 << (30 - int(a)) for a in ages]
        vi = np.round(g.value.to_numpy() * 10000).astype(object)
        row = out[et]
        assert row["n_events"] == len(g)
        assert row["decayed_count"] == pytest.approx(
            float(Fraction(sum(w), 1 << 30))
        )
        assert row["decayed_value"] == pytest.approx(
            float(sum(int(v) * x for v, x in zip(vi, w)))
            / ((1 << 30) * 10000.0)
        )


def test_pca_power_matches_independent_replica(spark, sf_dir):
    """Exact replica pin: recompute the quantized covariance and the
    magnitude-floor power iteration in INDEPENDENT numpy/int code (no
    shared helpers) — every component of v and the Rayleigh quotient
    must match the engine bit-for-bit."""
    from cs422pp_mapreduce_spark.operators import similarity as S

    rows = sorted(
        S.q_pca_power(spark, sf_dir).collect(), key=lambda r: r["pos"]
    )
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .toPandas()
    )
    X = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * S.PCA_SCALE
        + 0.5
    ).astype(object)  # python ints → exact arithmetic
    n, dim = X.shape
    Xi = [[int(x) for x in row] for row in X]
    s = [sum(Xi[r][j] for r in range(n)) for j in range(dim)]
    C = [
        [
            n * sum(Xi[r][i] * Xi[r][j] for r in range(n)) - s[i] * s[j]
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    v = [S.PCA_SCALE] + [0] * (dim - 1)
    for _ in range(S.PCA_ROUNDS):
        w = [sum(C[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        v = [(abs(x) * S.PCA_SCALE // m) * (1 if x >= 0 else -1) for x in w]
    assert [r["v"] for r in rows] == v
    num = sum(
        C[i][j] * v[i] * v[j] for i in range(dim) for j in range(dim)
    )
    den = sum(x * x for x in v)
    assert rows[0]["rayleigh"] == pytest.approx(float(num) / float(den))
    assert all(r["rayleigh"] == rows[0]["rayleigh"] for r in rows)


def test_power_iterate_finds_planted_spike():
    """Kernel-level behavioral pin: on a spectrum with a LARGE eigengap
    the fixed-round iteration does converge to the top eigenvector (the
    corpus fixture's gap is deliberately weak, so the contract there
    pins the iteration, not the limit — this pins the limit)."""
    from cs422pp_mapreduce_spark.operators.similarity import (
        PCA_SCALE,
        _power_iterate,
    )

    rng = np.random.RandomState(0)
    dim = 16
    u = rng.randn(dim)
    u /= np.linalg.norm(u)
    B = rng.randn(dim, dim)
    C = 1000.0 * np.outer(u, u) + (B + B.T) / 10.0
    Cq = {
        (i, j): int(C[i, j] * 1e6)
        for i in range(dim)
        for j in range(dim)
    }
    v = np.array(_power_iterate(Cq, dim), dtype=float)
    cos = abs(v @ u) / np.linalg.norm(v)
    assert cos > 0.9999

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

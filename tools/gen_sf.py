#!/usr/bin/env python3
"""Local fixture generator for scale-proof runs (VERDICT r04 ask #4).

Generates the engine's ten-table star schema (FIXTURES.md §B) at an
arbitrary scale factor, with the same physical parquet layouts the
driver fixtures use (events.ts as TIMESTAMP(NANOS), o_orderdate /
l_shipdate as timestamp[ms], embeddings as list<float32>) and the same
headline distributions, measured off /root/testdata/sf0.1:

- 31-word Zipfian document vocabulary, 10-100 tokens/doc;
  ~0.3% exact-dup docs, ~9% shared-60-char-lede docs, ~1% near-dup
  (10%-token-mutated) docs — so the dedup/minhash/novelty operator
  family sees the same candidate structure, not a degenerate corpus;
- unit-norm 64-d embeddings with weak label structure + ~1% planted
  near-twin pairs (the embedding_neardup workload);
- exponential(50) event values over a 30-day January-2024 span;
- TPC-H-ish FK web: lineitem→orders/part/supplier, orders→customer,
  customer/supplier→nation→region.

Row counts scale linearly from the sf0.1 baseline (documents 5 000,
embeddings 2 000, events 100 000, customer 15 000, supplier 1 000,
part 20 000, orders 150 000, lineitem 600 000).

Seed is fixed (4242 — deliberately NOT the driver's 42: this data is a
scaling instrument, not a replica) so runs are reproducible.

Usage: python tools/gen_sf.py OUT_DIR SF   # e.g. .../sf1 1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242

BASE_VOCAB = (
    "a agg batch big column data fast filter group hash join key line "
    "merge order part query row scan slow small sort spark stream table "
    "value vector window count distinct index"
).split()
assert len(BASE_VOCAB) == 31


def vocab_for(sf: float) -> list[str]:
    """Heaps'-law vocabulary scaling: the driver fixtures use a fixed
    31-word vocabulary, which is fine up to sf0.1 but UNREALISTIC for a
    10×-bigger corpus — with a capped trigram universe (31³ ≈ 30k), the
    docs-per-shingle density grows linearly with corpus size, and the
    exact inverted-index dedup twins (documented quadratic worst case)
    blow up quadratically on structure no real corpus has (real
    vocabulary grows sublinearly with corpus size). Scaling vocabulary
    ∝ sf^(1/3) keeps the trigram universe ∝ sf, i.e. docs-per-shingle
    ≈ constant at the sf0.1 fixture's measured density (~13) — the
    regime the operators are designed for and the one 100 TB exhibits."""
    n = max(31, round(31 * (sf / 0.1) ** (1 / 3)))
    extra = [f"w{i}" for i in range(n - 31)]
    return BASE_VOCAB + extra

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
MKTSEGS = ["BUILDING", "MACHINERY", "HOUSEHOLD", "FURNITURE", "AUTOMOBILE"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
PADJ = "large hot blue red small green dark light cold old new shiny".split()
PNOUN = "ring bolt screw washer nut gear wheel pin rod cap".split()
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    # 16Ki-row groups, NOT pyarrow's ~1Mi default: Spark parallelizes
    # a parquet scan at row-group granularity, so a single-group file
    # serializes every scan-side computation onto one task — the r13
    # quality_classifier sf10 straggler (one task doing all 500k docs'
    # tokenize+hash+explode while 13 read nothing, 92 s vs ~3 s).
    # A real lake is many files/row groups; the engine deliberately
    # does NOT defensively repartition text scans (that would shuffle
    # document content to paper over a storage-layout problem — the
    # compaction_plan operator exists for exactly this), so the
    # fixture must present the realistic layout.
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=16384,
    )
    print(f"  {name}: {table.num_rows} rows")


def gen(out_dir: str, sf: float) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / 0.1  # counts are defined off the sf0.1 baseline

    n_cust = int(15_000 * scale)
    n_supp = int(1_000 * scale)
    n_part = int(20_000 * scale)
    n_ord = int(150_000 * scale)
    n_li = int(600_000 * scale)
    n_ev = int(100_000 * scale)
    n_users = int(1_500 * scale)
    n_docs = int(5_000 * scale)
    n_vecs = int(2_000 * scale)

    # --- dims ------------------------------------------------------------
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(MKTSEGS)[rng.integers(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(
                rng.integers(0, len(PADJ), n_part),
                rng.integers(0, len(PNOUN), n_part),
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    # --- facts -----------------------------------------------------------
    day_ms = 86_400_000
    d95 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
    d01 = np.datetime64("2001-08-01").astype("datetime64[ms]").astype(np.int64)
    odate = (
        d95 + rng.integers(0, (d01 - d95) // day_ms + 1, n_ord) * day_ms
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("ms")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    d95b = d95 + day_ms
    d01b = np.datetime64("2001-11-04").astype("datetime64[ms]").astype(np.int64)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            d95b + rng.integers(0, (d01b - d95b) // day_ms + 1, n_li) * day_ms,
            pa.timestamp("ms"),
        ),
    }))

    # --- events (ts written as TIMESTAMP(NANOS), like the fixtures) ------
    jan1 = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    span_ns = 30 * 86_400 * 10**9
    ev_ts = np.sort(jan1 + rng.integers(0, span_ns, n_ev))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(
            np.minimum(rng.exponential(50.0, n_ev), 560.0), 2
        ),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # --- documents -------------------------------------------------------
    vocab = vocab_for(sf)
    zipf_w = 1.0 / np.arange(1, len(vocab) + 1) ** 0.9
    zipf_p = zipf_w / zipf_w.sum()
    lens = rng.integers(10, 101, n_docs)
    vocab_arr = np.array(vocab)
    all_toks = vocab_arr[
        rng.choice(len(vocab), size=int(lens.sum()), p=zipf_p)
    ]
    texts: list[str] = []
    off = 0
    for ln in lens:
        texts.append(" ".join(all_toks[off : off + ln]))
        off += ln
    # shared ledes (~9% of docs inherit a partner's first 12 tokens)
    n_lede = int(0.09 * n_docs)
    lede_dst = rng.choice(n_docs, size=n_lede, replace=False)
    lede_src = rng.integers(0, n_docs, n_lede)
    for d, s in zip(lede_dst, lede_src):
        if d == s:
            continue
        toks_d, toks_s = texts[d].split(" "), texts[s].split(" ")
        texts[d] = " ".join(toks_s[:12] + toks_d[12:])
    # near-dups (~1%: copy a partner, mutate 10% of tokens)
    n_near = int(0.01 * n_docs)
    near_dst = rng.choice(
        np.setdiff1d(np.arange(n_docs), lede_dst), size=n_near, replace=False
    )
    near_src = rng.integers(0, n_docs, n_near)
    for d, s in zip(near_dst, near_src):
        if d == s:
            continue
        toks = texts[s].split(" ")
        flip = rng.random(len(toks)) < 0.1
        toks = [
            vocab_arr[rng.integers(0, len(vocab))] if f else t
            for t, f in zip(toks, flip)
        ]
        texts[d] = " ".join(toks)
    # exact dups (~0.3%)
    n_exact = max(1, int(0.003 * n_docs))
    ex_dst = rng.choice(n_docs, size=n_exact, replace=False)
    ex_src = rng.integers(0, n_docs, n_exact)
    for d, s in zip(ex_dst, ex_src):
        if d != s:
            texts[d] = texts[s]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), size=n_docs, p=LANG_P)
        ],
        "source": [f"src{i % 20}" for i in range(n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings ------------------------------------------------------
    labels = rng.integers(0, 10, n_vecs)
    cents = rng.standard_normal((10, 64)) * 0.1
    X = rng.standard_normal((n_vecs, 64)) + cents[labels]
    # planted near-twins (~1% of vectors are a tiny perturbation of
    # another — the embedding_neardup workload)
    n_twin = int(0.01 * n_vecs)
    t_dst = rng.choice(np.arange(1, n_vecs), size=n_twin, replace=False)
    t_src = rng.integers(0, n_vecs, n_twin)
    X[t_dst] = X[t_src] + rng.standard_normal((n_twin, 64)) * 0.01
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(
            [row for row in X.astype(np.float32)],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    out = sys.argv[1]
    sf = float(sys.argv[2])
    print(f"generating sf={sf} into {out}")
    gen(out, sf)
    print("done")

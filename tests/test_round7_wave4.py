"""Round-7 wave-4 operators: linreg_ols, zscore_outliers,
entity_match, image_ahash (the real PNG pixel path).

Each gets an independent driver-side replica pin beside the DuckDB
oracle gate: NumPy least-squares, a pandas 3-sigma recomputation, a
brute-force O(n·m) Levenshtein sweep, and codec-level PNG round-trip /
all-five-filters reconstruction checks.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.operators import events as EV
from cs422pp_mapreduce_spark.operators import multimodal as MM
from cs422pp_mapreduce_spark.operators import relational as R


# --- linreg_ols ------------------------------------------------------------


def test_linreg_matches_numpy_lstsq(spark, sf_dir):
    rows = R.q_linreg_ols(spark, sf_dir).collect()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    assert rows
    for r in rows:
        g = li[
            (li.l_returnflag == r["l_returnflag"])
            & (li.l_linestatus == r["l_linestatus"])
        ]
        assert r["n_rows"] == len(g)
        slope, intercept = np.polyfit(
            g.l_quantity.to_numpy(), g.l_extendedprice.to_numpy(), 1
        )
        assert r["slope"] == pytest.approx(slope, rel=1e-9)
        assert r["intercept"] == pytest.approx(intercept, rel=1e-6)
        # r² in [0, 1] and equals the squared Pearson correlation
        cc = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]
        assert r["r2"] == pytest.approx(cc * cc, rel=1e-9)


# --- zscore_outliers -------------------------------------------------------


def test_zscore_outliers_match_pandas(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in EV.q_zscore_outliers(spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    assert out
    for et, g in ev.groupby("event_type"):
        # replicate the exact integer convention
        vi = np.round(g.value.to_numpy() * 10000).astype(object)
        n, s = len(vi), sum(vi)
        q = sum(v * v for v in vi)
        flags = sum(
            1 for v in vi if (n * v - s) ** 2 > 9 * (n * q - s * s)
        )
        row = out[et]
        assert row["n_events"] == n
        assert row["n_outliers"] == flags
        assert row["outlier_share"] == pytest.approx(flags / n)


def test_zscore_outliers_flags_are_rare(spark, sf_dir):
    for r in EV.q_zscore_outliers(spark, sf_dir).collect():
        # 3-sigma on a heavy-ish tail: some but few outliers
        assert 0 <= r["n_outliers"] < 0.05 * r["n_events"]


# --- entity_match ----------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_entity_match_equals_bruteforce(spark, sf_dir):
    got = {
        (r["c_custkey"], r["s_suppkey"], r["edit_dist"])
        for r in R.q_entity_match(spark, sf_dir).collect()
    }
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name")
        .toPandas()
    )
    supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", "s_name")
        .toPandas()
    )
    want = set()
    for ck, cn in zip(cust.c_custkey, cust.c_name):
        for sk, sn in zip(supp.s_suppkey, supp.s_name):
            d = _lev(cn[9:], sn[9:])
            if d <= 1:
                want.add((ck, sk, d))
    # the blocking is pigeonhole-COMPLETE for same-length lev<=1:
    # brute force and blocked plan must agree exactly (no recall loss)
    assert got == want
    assert want  # fixture actually exercises the operator


# --- image_ahash: the real PNG pixel path ----------------------------------


def test_png_roundtrip_recovers_pixels():
    for did in (0, 1, 123, 256, 257, 9999):
        px = MM.ahash_pixels(did)
        blob = MM.encode_png_gray8(px)
        assert blob[:8] == MM.PNG_SIG
        assert MM.decode_png_gray8(blob) == px


def test_ahash_pixels_repeat_across_groups():
    assert MM.ahash_pixels(5) == MM.ahash_pixels(5 + MM.IMG_GROUPS)
    assert MM.ahash_pixels(5) != MM.ahash_pixels(6)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_with_filters(pixels: list[list[int]], filters: list[int]) -> bytes:
    """Hand-built PNG applying the given per-row filter types — an
    implementation INDEPENDENT of encode_png_gray8 (computes each
    filter from the spec definitions) to pin the decoder on filters
    the engine's encoder never emits (Up/Average/Paeth)."""
    h, w = len(pixels), len(pixels[0])
    raw = bytearray()
    prev = [0] * w
    for r, row in enumerate(pixels):
        f = filters[r]
        raw.append(f)
        for c, v in enumerate(row):
            a = row[c - 1] if c > 0 else 0
            b = prev[c]
            cc = prev[c - 1] if c > 0 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = (
                    a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                )
            raw.append((v - pred) % 256)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        MM.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_decoder_reconstructs_all_five_filters():
    rng = np.random.RandomState(7)
    pixels = rng.randint(0, 256, size=(5, 8)).tolist()
    blob = _png_with_filters(pixels, [0, 1, 2, 3, 4])
    flat = [v for row in pixels for v in row]
    assert MM.decode_png_gray8(blob) == flat


def test_decoder_rejects_corrupt_crc():
    px = MM.ahash_pixels(3)
    blob = bytearray(MM.encode_png_gray8(px))
    blob[20] ^= 0xFF  # flip a bit inside the IHDR payload
    assert MM.decode_png_gray8(bytes(blob)) is None


def test_image_ahash_partitions_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    rows = MM.q_image_ahash(spark, sf_dir).collect()
    assert sum(r["n_images"] for r in rows) == n_docs
    # hashes are 16 lowercase hex chars
    assert all(
        len(r["ahash"]) == 16
        and set(r["ahash"]) <= set("0123456789abcdef")
        for r in rows
    )
    # kernel-level truth for the group containing doc 0
    px = MM.ahash_pixels(0)
    total = sum(px)
    bits = [1 if p * 64 > total else 0 for p in px]
    ah0 = "".join(
        "0123456789abcdef"[
            8 * bits[4 * k] + 4 * bits[4 * k + 1] + 2 * bits[4 * k + 2] + bits[4 * k + 3]
        ]
        for k in range(16)
    )
    match = [r for r in rows if r["ahash"] == ah0]
    assert match and match[0]["min_media_id"] == 0

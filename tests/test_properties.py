"""Property-based tests (hypothesis, SURVEY.md §5.2 #4): invariants
that must hold for any input, with Spark runs bounded by small scopes.

One shared Spark fixture, small deadline-free examples: each property
runs a handful of generated corpora through the real operators.
"""

from __future__ import annotations

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.functions.numeric import exact_sum
from cs422pp_mapreduce_spark.operators.wordcount import wordcount_df

words = st.sampled_from(["a", "bb", "ccc", "Δ", "x1", "zz", "q"])
lines = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join), min_size=0, max_size=12
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus=lines)
@SLOW
def test_wordcount_matches_counter(spark, corpus):
    expected = collections.Counter(
        w for line in corpus for w in line.split(" ") if w != ""
    )
    df = spark.createDataFrame(
        [(l,) for l in corpus] or [("",)], "value string"
    )
    got = {r["word"]: r["cnt"] for r in wordcount_df(df).collect()}
    assert got == dict(expected)


@given(corpus=lines, nparts=st.integers(min_value=1, max_value=5))
@SLOW
def test_wordcount_partitioning_invariant(spark, corpus, nparts):
    base = spark.createDataFrame([(l,) for l in corpus] or [("",)], "value string")
    a = {tuple(r) for r in wordcount_df(base.coalesce(1)).collect()}
    b = {tuple(r) for r in wordcount_df(base.repartition(nparts)).collect()}
    assert a == b


@given(
    vals=st.lists(
        st.decimals(
            min_value="-99999.99", max_value="99999.99", places=2
        ).map(float),
        min_size=1,
        max_size=30,
    ),
    nparts=st.integers(min_value=1, max_value=4),
)
@SLOW
def test_exact_sum_partitioning_invariant(spark, vals, nparts):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    one = df.coalesce(1).agg(exact_sum("x", 2, "s")).collect()[0]["s"]
    many = df.repartition(nparts).agg(exact_sum("x", 2, "s")).collect()[0]["s"]
    assert one == many  # bit-identical, not approx — that's the contract


@given(ids=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40))
@SLOW
def test_dedup_keeps_min_id_per_key(spark, ids):
    rows = [(i, f"text-{i % 5}") for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["text"]: r["doc_id"]
        for r in df.groupBy("text").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    want: dict[str, int] = {}
    for i, t in rows:
        want[t] = min(want.get(t, i), i)
    assert got == want


# --- BPE encoder properties (pure Python — fast, many examples) -----------

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(t=ascii_text)
def test_bpe_roundtrip_any_ascii(t):
    from cs422pp_mapreduce_spark.functions.bpe import DEFAULT_ENCODER

    pieces = DEFAULT_ENCODER.encode_pieces(t)
    assert DEFAULT_ENCODER.decode_pieces(pieces) == t


@settings(max_examples=100, deadline=None)
@given(t=st.text(max_size=120))  # arbitrary unicode incl. surrogateless
def test_bpe_pretokenize_partition_any_unicode(t):
    from cs422pp_mapreduce_spark.functions.bpe import pretokenize

    assert "".join(pretokenize(t)) == t


# --- winnowing properties (pure-Python replica of the operator) -----------


@settings(max_examples=100, deadline=None)
@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=5,
        max_size=60,
    )
)
def test_winnow_guarantee_shared_run_shares_fingerprint(toks):
    """Two docs sharing a run of ≥ K+W−1 tokens must share ≥1
    fingerprint — winnowing's defining guarantee (Schleimer et al.)."""
    import hashlib

    from cs422pp_mapreduce_spark.operators.textops import WINNOW_K, WINNOW_W

    def fps(t):
        hs = [
            int(
                hashlib.md5(
                    " ".join(t[i : i + WINNOW_K]).encode()
                ).hexdigest()[:15],
                16,
            )
            for i in range(len(t) - WINNOW_K + 1)
        ]
        return {
            min(hs[j : j + WINNOW_W])
            for j in range(max(len(hs) - WINNOW_W + 1, 1))
        }

    run_len = WINNOW_K + WINNOW_W - 1
    if len(toks) < run_len:
        return
    shared = toks[:run_len]
    doc_a = shared + ["pad%d" % i for i in range(7)]
    doc_b = ["alt%d" % i for i in range(7)] + shared
    assert fps(doc_a) & fps(doc_b)


points_2d = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=0,
    max_size=40,
)


@SLOW
@given(pts=points_2d, nparts=st.integers(min_value=1, max_value=4))
def test_skyline_equals_dominance_definition(spark, pts, nparts):
    """For ANY point set and ANY input partitioning, the range-exchange
    skyline kernel equals the brute-force dominance definition."""
    from cs422pp_mapreduce_spark.operators.relational import skyline_2d

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pts] or [(None, None)],
        "x int, y int",
    ).where(F.col("x").isNotNull()).repartition(nparts)
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    uniq = set(pts)
    want = sorted(
        p
        for p in uniq
        if not any(
            (q[0] <= p[0] and q[1] < p[1]) or (q[0] < p[0] and q[1] <= p[1])
            for q in uniq
        )
    )
    assert got == want


# --- round-7 kernels: PNG codec + wildcard blocking ------------------------

import struct as _struct
import zlib as _zlib


@given(
    st.lists(
        st.integers(min_value=0, max_value=255), min_size=64, max_size=64
    )
)
@settings(max_examples=50, deadline=None)
def test_png_codec_roundtrips_any_pixels(pixels):
    """The engine's PNG encode → independent decode must round-trip
    ANY 8×8 grayscale raster exactly (not just md5-derived ones)."""
    from cs422pp_mapreduce_spark.operators.multimodal import (
        decode_png_gray8,
        encode_png_gray8,
    )

    assert decode_png_gray8(encode_png_gray8(pixels)) == pixels


@given(
    st.lists(
        st.lists(st.integers(0, 255), min_size=6, max_size=6),
        min_size=2,
        max_size=6,
    ),
    st.lists(st.integers(0, 4), min_size=2, max_size=6),
)
@settings(max_examples=50, deadline=None)
def test_png_decoder_handles_any_filter_sequence(rows, filters):
    """Decode must reconstruct under ANY per-row spec filter choice —
    built by an independent reference encoder (the wave-4 test helper
    computes each filter from the spec definitions)."""
    from test_round7_wave4 import _png_with_filters

    from cs422pp_mapreduce_spark.operators.multimodal import (
        decode_png_gray8,
    )

    h = min(len(rows), len(filters))
    rows, filters = rows[:h], filters[:h]
    blob = _png_with_filters(rows, filters)
    assert decode_png_gray8(blob) == [v for r in rows for v in r]


@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=9, max_size=9),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_wildcard_blocking_complete_for_hamming_le_1(sfx):
    """Wildcard-key completeness (the entity_match blocking proof):
    for same-length strings, lev ≤ 1 ⟺ Hamming ≤ 1 ⟺ the two share a
    position-masked key. Pure-Python replica of _wildcard_keys."""

    def keys(s):
        return {s[:i] + "*" + s[i + 1 :] for i in range(9)}

    for a in sfx:
        for b in sfx:
            ham = sum(x != y for x, y in zip(a, b))
            share = bool(keys(a) & keys(b))
            assert share == (ham <= 1)


# --- r08: JPEG codec properties ---------------------------------------------


@given(
    st.lists(st.integers(0, 255), min_size=256, max_size=256),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_roundtrip_any_raster_and_fuzzed_decode(raster, seed):
    """(a) decode(encode(x)) succeeds on ANY 16x16 raster and
    preserves every block mean within the DC quantization step
    (Q00/8 = 2.125 gray levels, +1 fixed-point slack); (b) mutating
    one byte anywhere in the blob NEVER raises — the decoder returns
    None or a well-formed raster (malformed-input totality, the
    property a curation pipeline needs on real crawled bytes)."""
    import random as _random

    from cs422pp_mapreduce_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    blob = encode_jpeg_gray(raster, 16, 16)
    out = decode_jpeg_gray(blob)
    assert out is not None and (out[0], out[1]) == (16, 16)
    px = out[2]
    assert len(px) == 256 and all(0 <= v <= 255 for v in px)
    for by in range(2):
        for bx in range(2):
            idx = [
                (by * 8 + y) * 16 + bx * 8 + x
                for y in range(8)
                for x in range(8)
            ]
            src = sum(raster[i] for i in idx) / 64
            dec = sum(px[i] for i in idx) / 64
            # clamping can only pull the mean INWARD; unclamped DC
            # error is <= Q00/2/8 + fixed-point slack
            if all(8 <= raster[i] <= 247 for i in idx):
                assert abs(src - dec) <= 2.2

    rng = _random.Random(seed)
    mutated = bytearray(blob)
    pos = rng.randrange(len(mutated))
    mutated[pos] ^= 1 << rng.randrange(8)
    res = decode_jpeg_gray(bytes(mutated))
    if res is not None:
        w, h, px2 = res
        assert len(px2) == w * h
        assert all(0 <= v <= 255 for v in px2)


@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 3),
)
@settings(max_examples=40, deadline=None)
def test_media_container_fuzz_totality(seed, nmut):
    """Byte-fuzz totality for the WAV and AVI readers: flipping bits
    anywhere in a valid container NEVER raises — the reader returns
    None or a well-formed result. Also: a crafted deeply-nested LIST
    bomb returns None instead of blowing the recursion limit."""
    import random as _random
    import struct as _struct

    from cs422pp_mapreduce_spark.operators.multimodal import (
        JPEG16_SIDE,
        decode_avi_mjpeg,
        decode_wav_pcm16,
        encode_avi_mjpeg,
        encode_jpeg_gray,
        encode_wav_pcm16,
    )

    rng = _random.Random(seed)
    wav = encode_wav_pcm16([rng.randrange(-1000, 1001) for _ in range(200)])
    frame = encode_jpeg_gray([128] * 256, JPEG16_SIDE, JPEG16_SIDE)
    avi = encode_avi_mjpeg([frame, frame], JPEG16_SIDE, JPEG16_SIDE)

    for blob, dec in ((wav, decode_wav_pcm16), (avi, decode_avi_mjpeg)):
        mut = bytearray(blob)
        for _ in range(nmut):
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        res = dec(bytes(mut))
        if res is not None and dec is decode_wav_pcm16:
            rate, samples = res
            assert isinstance(rate, int) and isinstance(samples, list)
        elif res is not None:
            w, h, frames = res
            assert all(len(px) == w * h for px in frames)

    # LIST bomb: 2000 nested LIST headers
    bomb_body = b"AVI "
    for _ in range(2000):
        bomb_body += b"LIST" + _struct.pack("<I", 0xFFFF) + b"hdrl"
    bomb = b"RIFF" + _struct.pack("<I", len(bomb_body)) + bomb_body
    assert decode_avi_mjpeg(bomb) is None


@given(data=st.data())
@settings(max_examples=200, deadline=None)
def test_bpe_islands_parity_equals_fold(data):
    """The bpe_vocab oracle applies a compatible merge batch via the
    islands/parity rule (matched positions form runs; a merge starts
    at even offsets within a run; the following position drops). For
    ANY symbol sequence and ANY compatible batch (no shared symbol,
    no merged-string collision — the trainer's acceptance rule), that
    must equal the trainer's left-to-right fold. Hypothesis searches
    the space the three fixed corpora can't: (a,a) self-pair runs,
    adjacent distinct merges, merge outputs colliding with later
    positions."""
    syms = data.draw(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=24)
    )
    # draw a compatible batch under the trainer's acceptance rule
    cand = [(a, b) for a in "abcdef" for b in "abcdef"]
    data.draw(st.randoms()).shuffle(cand)
    used: set = set()
    batch: dict = {}
    for a, b in cand:
        if len(batch) >= 3:
            break
        if a in used or b in used or (a + b) in used:
            continue
        batch[(a, b)] = a + b
        used.update((a, b, a + b))

    # reference: the trainer's left-to-right fold
    out: list = []
    for s in syms:
        if out and (out[-1], s) in batch:
            out[-1] = batch[(out[-1], s)]
        else:
            out.append(s)

    # oracle rule: match positions, islands, even-offset starts
    n = len(syms)
    matched = [
        i for i in range(n - 1) if (syms[i], syms[i + 1]) in batch
    ]
    starts: set = set()
    run_start = None
    prev = None
    for i in matched:
        if prev is None or i != prev + 1:
            run_start = i
        if (i - run_start) % 2 == 0:
            starts.add(i)
        prev = i
    rebuilt: list = []
    i = 0
    while i < n:
        if i in starts:
            rebuilt.append(syms[i] + syms[i + 1])
            i += 2
        else:
            rebuilt.append(syms[i])
            i += 1
    assert rebuilt == out, (syms, batch)


@given(
    corpus=st.lists(
        st.lists(words, min_size=0, max_size=10).map(" ".join),
        min_size=0,
        max_size=10,
    )
)
@SLOW
def test_containment_equals_bruteforce_for_any_corpus(spark, corpus):
    """dedup_containment's prefix-filtered plan must equal the naive
    all-pairs definition on ANY corpus — including empty docs,
    single-token docs (shingle fallback), duplicate shingle sets
    (equal-size tiebreak), and threshold-boundary pairs."""
    from cs422pp_mapreduce_spark.operators.dedup import (
        CONTAIN_THRESHOLD,
        containment_pairs,
    )

    def shingles(text: str) -> set[str]:
        t = [w for w in text.split(" ") if w]
        if len(t) >= 3:
            return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        return set(t)

    docs = {i: line for i, line in enumerate(corpus)}
    sh = {d: shingles(t) for d, t in docs.items()}
    sh = {d: s for d, s in sh.items() if s}
    expect = set()
    for a, sa in sh.items():
        for b, sb in sh.items():
            na, nb = len(sa), len(sb)
            if a == b or na > nb or (na == nb and a >= b):
                continue
            if len(sa & sb) / na >= CONTAIN_THRESHOLD:
                expect.add((a, b))
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()] or [(0, "")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_inner"], r["doc_outer"])
        for r in containment_pairs(df).collect()
    }
    assert got == expect

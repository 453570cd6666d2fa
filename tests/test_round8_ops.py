"""Round-8 operator pins: streaming twins for the sequential-stats ops
(twap / cusum_drift) must equal their batch twins bit-for-bit across
staged micro-batch boundaries (the stream_ewma discipline)."""

from __future__ import annotations

from cs422pp_mapreduce_spark.operators import events as EV


def test_stream_twap_equals_batch_twin(spark, sf_dir):
    # Exact-integer interval state carried across 3 staged
    # micro-batches: area/span/count — and the final double division —
    # must equal the batch lead()-window aggregation exactly.
    from cs422pp_mapreduce_spark.streaming.stateful import q_stream_twap

    got = {
        r["user_id"]: (r["n_events"], r["span_us"], r["twap"])
        for r in q_stream_twap(spark, sf_dir).collect()
    }
    exp = {
        r["user_id"]: (r["n_events"], r["span_us"], r["twap"])
        for r in EV.q_twap(spark, sf_dir).collect()
    }
    assert got == exp


def test_stream_cusum_equals_batch_twin(spark, sf_dir):
    # The O(1)-state recurrence (P, min-prev-P, max-c as exact ints)
    # over a stream-static baseline join must equal the batch
    # three-window plan exactly, including the n-scaled normalization.
    from cs422pp_mapreduce_spark.streaming.stateful import q_stream_cusum

    got = {
        r["event_type"]: (r["n_events"], r["max_cusum"])
        for r in q_stream_cusum(spark, sf_dir).collect()
    }
    exp = {
        r["event_type"]: (r["n_events"], r["max_cusum"])
        for r in EV.q_cusum_drift(spark, sf_dir).collect()
    }
    assert got == exp


def test_cusum_stream_formula_matches_batch_window_identity():
    # Unit pin of the in-fold formula on a crafted all-negative drift
    # (the case where the textbook 0-floor recurrence DIVERGES from
    # the batch window formula): c_j = P_j - min(0, min_{k<j} P_k).
    devs = [-5, -1, -1]  # strictly-down drift: every batch c_j < 0
    p, mprev, cmax = 0, None, None
    for d in devs:
        p += d
        c = p - min(0, mprev) if mprev is not None else p
        cmax = c if cmax is None else max(cmax, c)
        mprev = p if mprev is None else min(mprev, p)
    # batch identity replay
    prefix = []
    acc = 0
    for d in devs:
        acc += d
        prefix.append(acc)
    cs = []
    for j, pj in enumerate(prefix):
        prev = prefix[:j]
        pmin_prev = min([min(x, 0) for x in prev], default=None)
        cs.append(pj - min(pmin_prev, 0) if pmin_prev is not None else pj)
    assert cmax == max(cs)
    # and it is NOT the 0-floor recurrence's answer on this input
    c0, mx0 = 0, 0
    for d in devs:
        c0 = max(0, c0 + d)
        mx0 = max(mx0, c0)
    assert mx0 != cmax


def test_triangle_count_sampled_doulion(spark, sf_dir):
    """Derandomized DOULION: (a) est = 64·sampled count exactly (pure
    integer scaling); (b) the md5 sparsifier keeps ~1/4 of edges;
    (c) the deterministic estimate lands within 25% of the exact count
    on the smoke fixture (observed 3.2% — the pin is loose because
    tiny graphs are the estimator's worst case); (d) two runs agree
    exactly (no RNG state anywhere)."""
    from cs422pp_mapreduce_spark.operators.graph import (
        copurchase_edges,
        q_triangle_count,
        q_triangle_count_sampled,
    )

    sm = q_triangle_count_sampled(spark, sf_dir).collect()[0]
    assert sm["est_triangles"] == 64 * sm["n_triangles_sampled"]

    m = copurchase_edges(spark, sf_dir).count()
    assert 0.15 * m <= sm["n_edges_sampled"] <= 0.35 * m

    exact = q_triangle_count(spark, sf_dir).collect()[0]["n_triangles"]
    assert 0.75 * exact <= sm["est_triangles"] <= 1.25 * exact

    again = q_triangle_count_sampled(spark, sf_dir).collect()[0]
    assert dict(again.asDict()) == dict(sm.asDict())


def test_wav_pcm_codec_roundtrip_and_negative_space():
    """The independent WAV reader recovers the writer's samples
    exactly (lossless PCM), skips unknown chunks with odd-length
    padding per spec, and returns None (never raises) on malformed
    input: truncation, wrong magic, compressed format tag, stereo,
    data-before-fmt, odd data length."""
    import struct

    from cs422pp_mapreduce_spark.operators.multimodal import (
        WAV_RATE,
        decode_wav_pcm16,
        encode_wav_pcm16,
        pcm_wave_params,
    )

    for doc in (0, 1, 13, 997, 4242):
        n, a, b = pcm_wave_params(doc)
        samples = [((a * t + b) % 2001) - 1000 for t in range(n)]
        blob = encode_wav_pcm16(samples)
        assert decode_wav_pcm16(blob) == (WAV_RATE, samples)

    samples = [0, 1000, -1000, 32767, -32768]
    blob = encode_wav_pcm16(samples)
    assert decode_wav_pcm16(blob) == (WAV_RATE, samples)

    # unknown chunk (odd length -> pad byte) between fmt and data
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    at = blob.index(b"data")
    padded = blob[:at] + extra + blob[at:]
    padded = padded[:4] + struct.pack("<I", len(padded) - 8) + padded[8:]
    assert decode_wav_pcm16(padded) == (WAV_RATE, samples)

    assert decode_wav_pcm16(None) is None
    assert decode_wav_pcm16(b"") is None
    assert decode_wav_pcm16(blob[:30]) is None
    assert decode_wav_pcm16(b"RIFX" + blob[4:]) is None
    mut = bytearray(blob)
    mut[20] = 3  # format tag -> IEEE float: refuse
    assert decode_wav_pcm16(bytes(mut)) is None
    mut = bytearray(blob)
    mut[22] = 2  # stereo: refuse
    assert decode_wav_pcm16(bytes(mut)) is None
    # data chunk before fmt
    hdr, fmtc, datac = blob[:12], blob[12:36], blob[36:]
    assert decode_wav_pcm16(hdr + datac + fmtc) is None
    # odd data length
    mut = bytearray(blob)
    mut[40:44] = struct.pack("<I", len(samples) * 2 - 1)
    assert decode_wav_pcm16(bytes(mut)) is None


def test_audio_features_match_local_recompute(spark, sf_dir):
    from cs422pp_mapreduce_spark.operators.multimodal import (
        WAV_RATE,
        pcm_wave_params,
        q_audio_features,
    )

    rows = {
        r["media_id"]: (
            r["rate"],
            r["n_samples"],
            r["peak"],
            r["energy"],
            r["zero_crossings"],
        )
        for r in q_audio_features(spark, sf_dir).collect()
    }
    assert rows
    for doc, got in list(rows.items())[:50]:
        n, a, b = pcm_wave_params(doc)
        s = [((a * t + b) % 2001) - 1000 for t in range(n)]
        zc = sum(1 for i in range(1, n) if s[i - 1] * s[i] < 0)
        assert got == (
            WAV_RATE,
            n,
            max(abs(v) for v in s),
            sum(v * v for v in s),
            zc,
        )


def test_avi_mjpeg_codec_roundtrip_and_negative_space():
    """The independent AVI reader recovers exactly the frames the
    writer embedded (each through the independent JPEG decoder), and
    returns None (never raises) on malformed containers: wrong magic,
    truncation, frame-count mismatch, corrupt frame bytes."""
    import struct

    from cs422pp_mapreduce_spark.operators.multimodal import (
        JPEG16_SIDE,
        decode_avi_mjpeg,
        decode_jpeg_gray,
        encode_avi_mjpeg,
        encode_jpeg_gray,
        video_frame_block_values,
        video_frame_count,
    )

    def raster(vals):
        return [
            vals[(y // 8) * 2 + (x // 8)]
            for y in range(JPEG16_SIDE)
            for x in range(JPEG16_SIDE)
        ]

    for doc in (0, 5, 123, 999):
        nf = video_frame_count(doc)
        frames = [
            encode_jpeg_gray(
                raster(video_frame_block_values(doc, f)),
                JPEG16_SIDE,
                JPEG16_SIDE,
            )
            for f in range(nf)
        ]
        blob = encode_avi_mjpeg(frames, JPEG16_SIDE, JPEG16_SIDE)
        dec = decode_avi_mjpeg(blob)
        assert dec is not None
        w, h, fpx = dec
        assert (w, h) == (JPEG16_SIDE, JPEG16_SIDE) and len(fpx) == nf
        for f in range(nf):
            assert fpx[f] == decode_jpeg_gray(frames[f])[2]

    assert decode_avi_mjpeg(None) is None
    assert decode_avi_mjpeg(b"RIFF\x10\x00\x00\x00WAVEdata") is None
    assert decode_avi_mjpeg(blob[: len(blob) // 2]) is None
    at = blob.index(b"00dc")
    mut = bytearray(blob)
    mut[at + 30] ^= 0xFF  # corrupt inside the first frame's JFIF
    assert decode_avi_mjpeg(bytes(mut)) is None
    # claim one more frame than the movi list carries
    mut = bytearray(blob)
    avih_at = blob.index(b"avih") + 8
    (claimed,) = struct.unpack("<I", blob[avih_at + 16 : avih_at + 20])
    mut[avih_at + 16 : avih_at + 20] = struct.pack("<I", claimed + 1)
    assert decode_avi_mjpeg(bytes(mut)) is None


def test_video_frame_stats_matches_local_recompute(spark, sf_dir):
    from cs422pp_mapreduce_spark.operators.multimodal import (
        q_video_frame_stats,
        video_frame_block_values,
        video_frame_count,
    )
    from tests.test_multimodal import _jpeg_expected_gray

    rows = {
        (r["media_id"], r["frame_idx"]): (r["brightness"], r["delta_prev"])
        for r in q_video_frame_stats(spark, sf_dir).collect()
    }
    assert rows
    docs = sorted({m for m, _ in rows})[:25]
    for d in docs:
        prev = None
        for f in range(video_frame_count(d)):
            grays = [
                _jpeg_expected_gray(v)
                for v in video_frame_block_values(d, f)
            ]
            b = (64 * sum(grays)) // 256
            delta = -1 if prev is None else abs(b - prev)
            assert rows[(d, f)] == (b, delta), (d, f)
            prev = b

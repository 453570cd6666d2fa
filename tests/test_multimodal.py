"""Multimodal plumbing: binary columns through mapInPandas with typed
schemas — real Spark-side shape, stubbed decode kernel."""

from __future__ import annotations

import pytest

from cs422pp_mapreduce_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_real,
    encode_fake_image,
    extract_image_meta,
    media_metadata_filter_then_decode,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, encode_fake_image(1, 640, 480), "image/fake"),
        (2, encode_fake_image(2, 4, 4, 1), "image/fake"),  # 9+16=25 bytes
        (3, b"not-an-image", "application/octet-stream"),
        (4, None, "image/fake"),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_extract_image_meta(spark, media_df):
    got = {r["media_id"]: r for r in extract_image_meta(media_df).collect()}
    assert got[1]["width"] == 640 and got[1]["height"] == 480
    assert got[2]["channels"] == 1
    assert got[3]["ok"] is False and got[3]["width"] is None
    assert got[4]["ok"] is False and got[4]["n_bytes"] == 0


def test_metadata_filter_prunes_before_decode(spark, media_df):
    got = media_metadata_filter_then_decode(media_df, min_bytes=50).collect()
    # only the 640x480 blob (9 header + 64 payload bytes) passes ≥50
    assert [r["media_id"] for r in got] == [1]


def test_sample_frames_shape(spark, media_df):
    frames = sample_frames(media_df, every_nth=4).collect()
    assert all(len(r["frame"]) == 1 for r in frames)
    ids = {r["media_id"] for r in frames}
    assert ids == {1, 2}  # undecodable blobs contribute no frames


def test_media_meta_contract_query(spark, sf_dir):
    """q_media_meta parses what synth_media built: cross-check against
    a pure-Python recomputation of the blob layout from doc_id."""
    from cs422pp_mapreduce_spark.operators.multimodal import q_media_meta

    got = {r["media_id"]: r for r in q_media_meta(spark, sf_dir).collect()}
    assert got and all(r["ok"] for r in got.values())
    for did, r in got.items():
        assert r["width"] == 16 + did % 485
        assert r["height"] == 16 + (did * 7) % 485
        assert r["channels"] == 1 + did % 4
        assert r["n_bytes"] == 10 + did % 8


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"anything")


def test_media_to_embedding_to_similarity(spark):
    """The full multimodal story: blob → (stub) feature extraction →
    embedding column → the engine's similarity operators. The feature
    extractor is a deterministic fake; the plumbing (mapInPandas,
    array<float> column, cosine ranking) is the real production path."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cs422pp_mapreduce_spark.operators.similarity import cosine

    rows = [(i, encode_fake_image(i, 16 + i, 16), "image/fake") for i in range(20)]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    emb_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def embed(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for blob in pdf["blob"]:
                rng = np.random.default_rng(len(blob))  # deterministic fake
                out.append(rng.standard_normal(8).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": out})

    embedded = media.mapInPandas(embed, schema=emb_schema)
    q = embedded.where(F.col("media_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qvec")
    )
    ranked = (
        embedded.where(F.col("media_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "media_id",
            cosine(
                F.col("embedding").cast("array<double>"), F.col("qvec")
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "media_id")
        .limit(5)
        .collect()
    )
    assert len(ranked) == 5
    sims = [r["sim"] for r in ranked]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_wav_decode_parses_python_built_header():
    # build a canonical PCM WAV header with struct (independent of the
    # Spark-side hex builder) and require exact field recovery
    import struct

    from cs422pp_mapreduce_spark.operators.multimodal import decode_wav_stub

    ch, sr, bits, n_samples = 2, 22050, 16, 123
    data_size = n_samples * ch * (bits // 8)
    blob = (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                sr * ch * bits // 8, ch * bits // 8, bits)
        + b"data" + struct.pack("<I", data_size) + b"\x00" * 8
    )
    got = decode_wav_stub(blob)
    assert got == {
        "n_channels": ch, "sample_rate": sr, "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_us": n_samples * 1_000_000 // sr,
    }
    assert decode_wav_stub(b"RIFX" + blob[4:]) is None
    assert decode_wav_stub(blob[:40]) is None
    assert decode_wav_stub(None) is None


def test_synth_audio_roundtrip_through_spark(spark, sf_dir):
    from cs422pp_mapreduce_spark.operators.multimodal import q_audio_meta

    rows = q_audio_meta(spark, sf_dir).collect()
    assert rows and all(r.ok for r in rows)
    for r in rows[:50]:
        assert r.n_channels == 1 + r.media_id % 2
        assert r.sample_rate == (8000, 16000, 22050, 44100)[r.media_id % 4]
        assert r.n_samples == 100 + r.media_id % 50
        assert r.duration_us == r.n_samples * 1_000_000 // r.sample_rate


def test_audio_real_decoder_is_explicit_stub():
    from cs422pp_mapreduce_spark.operators.multimodal import decode_audio_real

    with pytest.raises(NotImplementedError):
        decode_audio_real(b"RIFF")


def test_video_decode_parses_struct_built_header():
    import struct

    from cs422pp_mapreduce_spark.operators.multimodal import decode_video_stub

    blob = b"VID0" + struct.pack("<HHBH", 320, 240, 25, 500) + b"\x01" * 8
    assert decode_video_stub(blob) == {
        "width": 320, "height": 240, "fps": 25, "n_frames": 500,
        "duration_ms": 500 * 1000 // 25,
    }
    assert decode_video_stub(b"IMG0" + blob[4:]) is None
    assert decode_video_stub(blob[:10]) is None
    assert decode_video_stub(None) is None


def test_synth_video_roundtrip_through_spark(spark, sf_dir):
    from cs422pp_mapreduce_spark.operators.multimodal import q_video_meta

    rows = q_video_meta(spark, sf_dir).collect()
    assert rows and all(r.ok for r in rows)
    for r in rows[:50]:
        assert r.width == 64 + (r.media_id % 16) * 16
        assert r.height == 48 + (r.media_id % 9) * 16
        assert r.fps == (24, 25, 30)[r.media_id % 3]
        assert r.n_frames == 100 + r.media_id % 200
        assert r.duration_ms == r.n_frames * 1000 // r.fps

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


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"anything")

"""Round-7 wave-6 operators: twap, cusum_drift, image_resize,
seq_length_histogram.

Replica pins: pandas time-weighted recomputation, the TEXTBOOK
sequential CUSUM recurrence (validating the window-algebra
decomposition), numpy 2×2 pooling over the known raster, and
mass-conservation checks for the histogram.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from cs422pp_mapreduce_spark.operators import events as EV
from cs422pp_mapreduce_spark.operators import multimodal as MM
from cs422pp_mapreduce_spark.operators import textops as TX


def test_twap_matches_pandas(spark, sf_dir):
    out = {r["user_id"]: r for r in EV.q_twap(spark, sf_dir).collect()}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.unix_micros("ts").alias("t"), "event_id", "value")
        .toPandas()
    )
    assert out
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["t", "event_id"])
        t = g.t.to_numpy()
        span = int(t[-1] - t[0])
        if span <= 0:
            assert uid not in out
            continue
        vi = np.round(g.value.to_numpy() * 10000).astype(object)
        area = sum(int(t[i + 1] - t[i]) * vi[i] for i in range(len(t) - 1))
        row = out[uid]
        assert row["n_events"] == len(g)
        assert row["span_us"] == span
        assert row["twap"] == pytest.approx(float(area) / (span * 10000.0))


def test_cusum_matches_sequential_recurrence(spark, sf_dir):
    out = {
        r["event_type"]: r for r in EV.q_cusum_drift(spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
    )
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        vi = np.round(g.value.to_numpy() * 10000).astype(object)
        n, s = len(vi), sum(vi)
        # textbook recurrence over n-scaled integer deviations
        c = 0
        best = 0
        for v in vi:
            c = max(0, c + (n * v - s))
            best = max(best, c)
        row = out[et]
        assert row["n_events"] == n
        assert row["max_cusum"] == pytest.approx(
            float(best) / (n * 10000.0)
        )


def test_image_resize_matches_numpy_pooling(spark, sf_dir):
    rows = {
        r["media_id"]: r for r in MM.q_image_resize(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").limit(5).collect()]
    for did in ids:
        px = np.array(MM.ahash_pixels(did)).reshape(8, 8)
        pooled = (
            px.reshape(4, 2, 4, 2).transpose(0, 2, 1, 3).reshape(4, 4, 4)
        ).sum(axis=2) // 4
        want_hex = "".join(f"{v:02x}" for v in pooled.flatten())
        row = rows[did]
        assert row["pooled_hex"] == want_hex
        assert row["brightness"] == int(px.sum()) // 64


def test_seq_length_histogram_conserves_mass(spark, sf_dir):
    rows = sorted(
        TX.q_seq_length_histogram(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    shares = [r["cum_doc_share"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == pytest.approx(1.0)
    assert rows[-1]["cum_token_share"] == pytest.approx(1.0)
    for r in rows:
        assert r["cutoff_tokens"] == (r["bucket"] + 1) * 16


def test_media_pipeline_composition(spark, sf_dir):
    """The composed manifest must agree with its stages: keep-list =
    min media_id per image_ahash group, thumbnails = image_resize rows
    of exactly the keepers."""
    rows = MM.q_media_pipeline(spark, sf_dir).collect()
    ahash_groups = {
        r["ahash"]: r for r in MM.q_image_ahash(spark, sf_dir).collect()
    }
    resize = {
        r["media_id"]: r for r in MM.q_image_resize(spark, sf_dir).collect()
    }
    assert len(rows) == len(ahash_groups)
    for r in rows:
        g = ahash_groups[r["ahash"]]
        assert r["media_id"] == g["min_media_id"]
        assert r["n_images"] == g["n_images"]
        t = resize[r["media_id"]]
        assert r["pooled_hex"] == t["pooled_hex"]
        assert r["brightness"] == t["brightness"]

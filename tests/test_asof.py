"""As-of / range join unit semantics on literal frames (ties, empty
matches, boundary inclusion)."""

from __future__ import annotations

import datetime

from cs422pp_mapreduce_spark.operators.asof import asof_join, range_join_bucketed


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00")), (2, _ts("2024-01-01 00:00:00"))],
        "k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),
            (1, _ts("2024-01-01 11:00:00"), 101),  # latest ≤ 12:00
            (1, _ts("2024-01-01 11:00:00"), 102),  # tie → max rid wins
            (1, _ts("2024-01-01 13:00:00"), 103),  # after left → ignored
        ],
        "k long, rts timestamp, rid long",
    )
    out = {
        r["k"]: r["matched"]
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            carry_cols={"rid": "matched"},
        ).collect()
    }
    assert out[1] == 102  # deterministic tie-break: last in (ts, rid)
    assert out[2] is None  # no right row at/before


def test_asof_boundary_inclusive(spark):
    t = _ts("2024-01-01 12:00:00")
    left = spark.createDataFrame([(1, t)], "k long, lts timestamp")
    right = spark.createDataFrame([(1, t, 7)], "k long, rts timestamp, rid long")
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        carry_cols={"rid": "matched"},
    ).collect()
    assert out[0]["matched"] == 7  # rts == lts counts (≤ semantics)


def test_range_join_window_bounds(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), 0)], "k long, lts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 12:00:00"), 1),   # == start: in
            (1, _ts("2024-01-01 12:29:59"), 2),   # in
            (1, _ts("2024-01-01 12:30:00"), 3),   # == end: out (half-open)
            (1, _ts("2024-01-01 11:59:59"), 4),   # before: out
            (2, _ts("2024-01-01 12:10:00"), 5),   # other key: out
        ],
        "k long, rts timestamp, rid long",
    )
    got = sorted(
        r["rid"]
        for r in range_join_bucketed(
            left, right, key="k", left_ts="lts", right_ts="rts",
            width_seconds=1800,
        ).collect()
    )
    assert got == [1, 2]

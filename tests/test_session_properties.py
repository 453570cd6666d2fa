"""Property-based sessionization spec: for ANY event stream, sessions
must partition each user's events, close over ≤gap chains, and be
separated by >gap silences (session_window's merge boundary is
INCLUSIVE: an exactly-gap silence merges — verified empirically and
pinned by test_events_streaming.test_session_gap_boundary)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cs422pp_mapreduce_spark.operators.events import q_event_session

BASE = datetime.datetime(2024, 1, 1)
GAP = 30 * 60

offsets = st.lists(
    st.integers(min_value=0, max_value=6 * 3600), min_size=1, max_size=25
)


@given(offs_by_user=st.dictionaries(
    st.integers(min_value=0, max_value=3), offsets, min_size=1, max_size=3
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_session_spec(spark, tmp_path, offs_by_user):
    rows = []
    eid = 0
    for uid, offs in offs_by_user.items():
        for o in offs:
            rows.append(
                (eid, BASE + datetime.timedelta(seconds=o), uid, "e", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import os
    import uuid

    d = str(tmp_path / f"ev_{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")

    sessions = sorted(
        (
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in q_event_session(spark, d).collect()
        ),
        key=lambda t: (t[0], t[1]),
    )

    # 1. sessions partition events: per-user counts add up
    by_user_count: dict[int, int] = {}
    for uid, _, _, n in sessions:
        by_user_count[uid] = by_user_count.get(uid, 0) + n
    assert by_user_count == {
        uid: len(offs) for uid, offs in offs_by_user.items()
    }

    # 2. within a user, consecutive sessions are separated by > GAP and
    #    ordered; session bounds are consistent
    for (u1, s1, e1, _), (u2, s2, e2, _) in zip(sessions, sessions[1:]):
        if u1 != u2:
            continue
        assert (s2 - e1).total_seconds() > GAP
        assert s1 <= e1 and s2 <= e2

    # 3. reference oracle: python gaps-and-islands on the same data
    for uid, offs in offs_by_user.items():
        times = sorted(offs)
        n_sessions = 1 + sum(
            1 for a, b in zip(times, times[1:]) if b - a > GAP
        )
        got = sum(1 for s in sessions if s[0] == uid)
        assert got == n_sessions

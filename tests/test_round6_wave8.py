"""Round-6 wave-8: snapshot diff, DQ audit, BFS reach, interval
sweep-line, exact order statistics, OHLC resampling."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F


def test_table_diff_planted(spark):
    """Hand-built snapshots: classification of added / removed /
    changed, null-payload rows still classify via the presence
    markers, and an all-equal row (including NULL == NULL) is
    unchanged (absent)."""
    from cs422pp_mapreduce_spark.operators.maintenance import table_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, None, None),   # all-NULL payload, present in both
            (4, "d", 40.0),    # removed
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "b", 21.0),    # changed
            (3, None, None),   # unchanged (null-safe equality)
            (5, None, None),   # added with all-NULL payload
        ],
        "k long, s string, v double",
    )
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, "k").collect()}
    assert got == {2: "changed", 4: "removed", 5: "added"}


def test_table_diff_counts_match_mods(spark, sf_dir):
    """Every classified key obeys its deriving modulus."""
    from cs422pp_mapreduce_spark.operators.maintenance import (
        DIFF_ADD_MOD,
        DIFF_ADD_OFFSET,
        DIFF_CHG_MOD,
        DIFF_DEL_MOD,
        q_table_diff,
    )

    rows = q_table_diff(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k, ct = r["o_orderkey"], r["change_type"]
        if ct == "added":
            assert k >= DIFF_ADD_OFFSET and (k - DIFF_ADD_OFFSET) % DIFF_ADD_MOD == 0
        elif ct == "removed":
            assert k % DIFF_DEL_MOD == 0
        else:
            assert ct == "changed"
            assert k % DIFF_CHG_MOD == 0 and k % DIFF_DEL_MOD != 0


def test_dq_report_structure(spark, sf_dir):
    """All 14 checks present; the synthetic warehouse passes the
    referential / pk / null invariants its generator guarantees."""
    from cs422pp_mapreduce_spark.operators.maintenance import q_dq_report

    from cs422pp_mapreduce_spark.sources.catalog import load_table

    out = {r["check_name"]: r["violations"] for r in q_dq_report(spark, sf_dir).collect()}
    assert len(out) == 14
    assert all(isinstance(v, int) and v >= 0 for v in out.values())
    # invariants the generator does guarantee
    for must_pass in ("li_fk_orphans", "ord_custkey_null",
                      "ev_ts_null", "li_returnflag_null"):
        assert out[must_pass] == 0, (must_pass, out[must_pass])
    # checks with real violations in the fixture: cross-check the math
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    n_distinct = li.select("l_orderkey", "l_linenumber").distinct().count()
    assert out["li_pk_duplicates"] == n - n_distinct
    orders = load_table(spark, sf_dir, "orders")
    ship_before = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") < F.col("o_orderdate"))
        .count()
    )
    assert out["li_ship_before_order"] == ship_before


def test_max_concurrency_half_open_boundary(spark):
    """An interval ending exactly when another starts does NOT
    overlap it; genuine overlap counts."""
    from cs422pp_mapreduce_spark.operators.events import (
        max_concurrent_per_day,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, t0),                                  # [10:00, 11:00)
            (2, t0 + dt.timedelta(minutes=60)),       # [11:00, 12:00) — touches, no overlap
            (3, t0 + dt.timedelta(days=1)),           # next day: [10:00, 11:00)
            (4, t0 + dt.timedelta(days=1, minutes=59)),  # overlaps 3
        ],
        "event_id long, ts timestamp",
    )
    got = {r["day"].day: r["max_concurrency"] for r in
           max_concurrent_per_day(ev, 60).collect()}
    assert got == {1: 1, 2: 2}


def test_max_concurrency_matches_bruteforce(spark, sf_dir):
    """Kernel result equals a per-day brute-force sweep recomputation
    on the smoke fixture."""
    from cs422pp_mapreduce_spark.operators.events import (
        CONCURRENCY_INTERVAL_MIN,
        q_max_concurrency,
    )
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    got = {r["day"]: r["max_concurrency"] for r in
           q_max_concurrency(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts").collect()
    bounds = []
    for r in ev:
        bounds.append((r["ts"], 1, r["event_id"]))
        bounds.append((r["ts"] + dt.timedelta(minutes=CONCURRENCY_INTERVAL_MIN),
                       -1, r["event_id"]))
    bounds.sort()
    run = 0
    expect: dict = {}
    for t, delta, _eid in bounds:
        run += delta
        if delta == 1:
            day = t.replace(hour=0, minute=0, second=0, microsecond=0)
            expect[day] = max(expect.get(day, 0), run)
    assert got == expect


def test_exact_kth_cents_property(spark):
    """Distributed selection equals sorted()[k-1] over random
    integer multisets (duplicates, negatives, narrow + wide ranges)."""
    from cs422pp_mapreduce_spark.operators.relational import exact_kth_cents

    rng = random.Random(42)
    cases = [
        [rng.randint(0, 10) for _ in range(200)],          # heavy duplicates
        [rng.randint(-10**6, 10**6) for _ in range(500)],  # wide range
        [7] * 50,                                          # constant
        [rng.randint(0, 3) for _ in range(5)],             # tiny
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "cents long")
        srt = sorted(vals)
        for k in {1, len(vals) // 2 + 1, len(vals)}:
            assert exact_kth_cents(df, "cents", k) == srt[k - 1], (k, vals[:10])


def test_order_stat_vs_sorted(spark, sf_dir):
    """q_order_stat's p50/p90 equal the sorted-cents order statistic
    on the smoke fixture."""
    from cs422pp_mapreduce_spark.operators.relational import q_order_stat
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    got = {r["stat_name"]: (r["k"], r["value_cents"]) for r in
           q_order_stat(spark, sf_dir).collect()}
    cents = sorted(
        int(r["c"]) for r in load_table(spark, sf_dir, "lineitem")
        .select((F.col("l_extendedprice").cast("decimal(12,2)") * 100)
                .cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    assert got["p50"] == ((n + 1) // 2, cents[(n + 1) // 2 - 1])
    assert got["p90"] == ((9 * n + 9) // 10, cents[(9 * n + 9) // 10 - 1])


def test_bfs_hops_planted(spark):
    """Path graph 1-2-3-4-5-6-7 with source {1}: hops are the path
    distances, capped at BFS max; disconnected node 99 is absent."""
    from cs422pp_mapreduce_spark.operators.graph import bfs_hops

    edges = [(i, i + 1) for i in range(1, 7)] + [(99, 100)]
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hop"] for r in bfs_hops(sym, sources, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_reach_min_hop(spark, sf_dir):
    """Engine hops equal a NetworkX-free BFS recomputation on the
    smoke-fixture transaction graph."""
    from collections import deque

    from cs422pp_mapreduce_spark.operators.graph import (
        BFS_MAX_HOPS,
        BFS_SOURCE_MOD,
        q_bfs_reach,
        transaction_edges,
    )

    got = {r["node"]: r["hop"] for r in q_bfs_reach(spark, sf_dir).collect()}
    edges = transaction_edges(spark, sf_dir).collect()
    adj: dict = {}
    for r in edges:
        a, b = r["cust"], r["supp"]
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sources = [n for n in adj if n < 1_000_000 and n % BFS_SOURCE_MOD == 0]
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        if dist[u] >= BFS_MAX_HOPS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    assert got == dist


def test_resample_ohlc_deterministic_picks(spark, sf_dir):
    """Open/close picks equal the (ts, event_id)-ordered first/last
    value per (event_type, hour); high/low bracket them."""
    from cs422pp_mapreduce_spark.operators.events import q_resample_ohlc
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    bars = q_resample_ohlc(spark, sf_dir).collect()
    assert bars
    ev = load_table(spark, sf_dir, "events").collect()
    groups: dict = {}
    for r in ev:
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        groups.setdefault((r["event_type"], hour), []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    for b in bars:
        rows = sorted(groups[(b["event_type"], b["hour"])])
        assert b["open"] == rows[0][2]
        assert b["close"] == rows[-1][2]
        vals = [v for _, _, v in rows]
        assert b["high"] == max(vals) and b["low"] == min(vals)
        assert b["volume"] == len(rows)
        assert b["low"] <= b["open"] <= b["high"]
        assert b["low"] <= b["close"] <= b["high"]


def test_attribution_last_touch_recompute(spark, sf_dir):
    """Engine report equals a literal per-purchase last-touch replay
    (72 h window, touches-before-purchases at equal ts, event_id
    tiebreak) on the smoke fixture."""
    import datetime as dt
    from collections import defaultdict

    from cs422pp_mapreduce_spark.operators.events import (
        ATTRIB_TOUCH_TYPES,
        ATTRIB_WINDOW_HOURS,
        q_attribution,
    )
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    got = {
        (r["touch_type"], r["day"]): (r["n_purchases"], r["revenue"])
        for r in q_attribution(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        if r["event_type"] in (*ATTRIB_TOUCH_TYPES, "purchase"):
            kind = 1 if r["event_type"] == "purchase" else 0
            by_user[r["user_id"]].append(
                (r["ts"], kind, r["event_id"], r["event_type"], r["value"])
            )
    expect_n = defaultdict(int)
    expect_rev = defaultdict(float)
    for rows in by_user.values():
        rows.sort()
        last_touch = None
        for ts, kind, _eid, etype, value in rows:
            if kind == 0:
                last_touch = (ts, etype)
            else:
                if (last_touch is not None and last_touch[0]
                        >= ts - dt.timedelta(hours=ATTRIB_WINDOW_HOURS)):
                    tt = last_touch[1]
                else:
                    tt = "direct"
                day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
                expect_n[(tt, day)] += 1
                expect_rev[(tt, day)] += value
    assert set(got) == set(expect_n)
    for key, (n, rev) in got.items():
        assert n == expect_n[key]
        assert abs(rev - expect_rev[key]) < 1e-6


def test_source_overlap_recompute(spark, sf_dir):
    """Engine matrix equals a literal shingle-set recomputation;
    Jaccard is symmetric-bounded and src_a < src_b."""
    from collections import defaultdict

    from cs422pp_mapreduce_spark.operators.textops import q_source_overlap
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    rows = q_source_overlap(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").collect()
    sets = defaultdict(set)
    for r in docs:
        t = [x for x in r["text"].split(" ") if x]
        grams = (
            {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
            if len(t) >= 3 else set(t)
        )
        sets[r["source"]] |= grams
    seen = set()
    for r in rows:
        a, b = r["src_a"], r["src_b"]
        assert a < b
        seen.add((a, b))
        inter = len(sets[a] & sets[b])
        assert r["n_shared"] == inter and inter > 0
        assert r["n_a"] == len(sets[a]) and r["n_b"] == len(sets[b])
        union = len(sets[a] | sets[b])
        assert abs(r["jaccard"] - inter / union) < 1e-6
    expect_pairs = {
        (a, b)
        for a in sets for b in sets
        if a < b and sets[a] & sets[b]
    }
    assert seen == expect_pairs


def test_funnel_windowed_recompute(spark, sf_dir):
    """Greedy earliest-completion funnel equals a literal per-user
    replay; windowed counts never exceed plain funnel's any-time
    ordering counts."""
    import datetime as dt
    from collections import defaultdict

    from cs422pp_mapreduce_spark.operators.events import (
        FUNNEL_WINDOW_HOURS,
        q_funnel,
        q_funnel_windowed,
    )
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    got = q_funnel_windowed(spark, sf_dir).collect()[0]
    plain = q_funnel(spark, sf_dir).collect()[0]
    W = dt.timedelta(hours=FUNNEL_WINDOW_HOURS)

    ev = load_table(spark, sf_dir, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        if r["event_type"] in ("signup", "click", "purchase"):
            by_user[r["user_id"]].append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    n_signup = n_click = n_purchase = 0
    for rows in by_user.values():
        rows.sort()
        t1 = t2 = t3 = None
        for ts, _eid, et in rows:
            # iteration follows the engine's (ts, event_id) order, so
            # "strictly preceding frame" = already-seen rows
            if et == "signup" and t1 is None:
                t1 = ts
            elif (et == "click" and t2 is None and t1 is not None
                    and ts <= t1 + W):
                t2 = ts
            elif (et == "purchase" and t3 is None and t2 is not None
                    and ts <= t2 + W):
                t3 = ts
        n_signup += t1 is not None
        n_click += t2 is not None
        n_purchase += t3 is not None
    assert got["n_users"] == len(by_user)
    assert got["n_signup"] == n_signup
    assert got["n_signup_then_click"] == n_click
    assert got["n_full_funnel"] == n_purchase
    assert got["n_signup"] == plain["n_signup"]

#!/usr/bin/env python3
"""Close-pair arithmetic: vs-previous-round and vs-pin comparisons
over bench.py JSON outputs (the BASELINE.md close-section numbers).

Usage: python tools/compare_bench.py CUR_SF01 CUR_SF1 PREV_SF01 PREV_SF1
"""

from __future__ import annotations

import json
import statistics
import sys

# round-1 headline subset with the dated re-pins (BASELINE.md):
# group_agg r08 1.45, multi_join_agg r09 1.45, dedup_ngram r07 2.13
PINS = {
    "wordcount": 0.44,
    "group_agg": 1.45,
    "hash_join": 0.38,
    "multi_join_agg": 1.45,
    "window_rank": 0.41,
    "event_tumbling": 0.33,
    "event_session": 0.43,
    "event_rollup": 0.78,
    "topk": 0.14,
    "json_funcs": 0.36,
    "asof_join": 0.52,
    "range_join": 0.41,
    "topk_similarity": 0.34,
    "ann_lsh": 0.64,
    "dedup_minhash": 0.93,
    "dedup_ngram": 2.13,
    "text_stats": 0.24,
    "tpch_q3": 0.74,
    "corpus_prep": 1.23,
}


def main() -> None:
    cur01, cur1, prev01, prev1 = (
        json.load(open(p))["queries"] for p in sys.argv[1:5]
    )

    def tot(d, keys):
        return sum(d[k] for k in keys)

    common01 = sorted(set(cur01) & set(prev01))
    common1 = sorted(set(cur1) & set(prev1))
    print(
        f"sf0.1 common ({len(common01)}): cur {tot(cur01, common01):.1f}"
        f" vs prev {tot(prev01, common01):.1f}"
        f" = {tot(cur01, common01)/tot(prev01, common01):.2f}x"
    )
    print(
        f"sf1 common ({len(common1)}): cur {tot(cur1, common1):.1f}"
        f" vs prev {tot(prev1, common1):.1f}"
        f" = {tot(cur1, common1)/tot(prev1, common1):.2f}x"
    )
    worst = sorted(
        ((cur01[k] / max(prev01[k], 1e-9), k) for k in common01),
        reverse=True,
    )[:8]
    print("worst sf0.1 vs prev:", [(k, round(r, 2)) for r, k in worst])

    sub = [k for k in PINS if k in cur01]
    print(
        f"19-query round-1 subset: {tot(cur01, sub):.2f} s vs"
        f" {sum(PINS[k] for k in sub):.2f} pinned ="
        f" {tot(cur01, sub)/sum(PINS[k] for k in sub):.2f}x"
    )
    perq = [(k, round(cur01[k] / PINS[k], 2)) for k in sub]
    print("vs-pin per query:", sorted(perq, key=lambda t: -t[1])[:5])

    # 10x curve
    both = sorted(set(cur01) & set(cur1))
    ratios = [cur1[k] / max(cur01[k], 1e-9) for k in both]
    print(
        f"10x curve ({len(both)}): total"
        f" {tot(cur01, both):.1f} -> {tot(cur1, both):.1f} ="
        f" {tot(cur1, both)/tot(cur01, both):.2f}x, median"
        f" {statistics.median(ratios):.2f}x, red-line(20x):"
        f" {[k for k in both if cur1[k]/max(cur01[k],1e-9) >= 20]}"
    )
    big = sorted(((cur1[k] / max(cur01[k], 1e-9), k) for k in both), reverse=True)[:8]
    print("largest 10x ratios:", [(k, round(r, 2)) for r, k in big])
    slow1 = sorted(((cur1[k], k) for k in cur1), reverse=True)[:8]
    print("slowest sf1 rows:", [(k, v) for v, k in slow1])


if __name__ == "__main__":
    main()

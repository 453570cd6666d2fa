"""Per-query scaling curve from two bench.py JSON outputs.

The scale-proof instrument (VERDICT r04 ask #4): run bench.py at two
scale factors (e.g. sf0.1 and the locally generated sf1 —
tools/gen_sf.py), then compare per-query wall times. For a 10× data
ratio, a data-linear query should show time ratio ≈ 10 × (per-job
fixed overhead keeps small-sf times floored, so ratios well BELOW the
data ratio are normal at these scales); ratios far ABOVE it indicate
superlinear work — the thing the 100 TB design claims say must not
exist.

Usage:
  python tools/scale_curve.py BENCH_SMALL.json BENCH_BIG.json [data_ratio]

Prints a markdown table sorted by ratio (worst first) and a summary
line; exits 1 if any query's ratio exceeds 2 × data_ratio (the
superlinear red line, generous because constant overheads shift
mixes).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    small_path, big_path = sys.argv[1], sys.argv[2]
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb), key=lambda n: -(qb[n] / qs[n]))
    rows = [(n, qs[n], qb[n], qb[n] / qs[n]) for n in common]
    print(f"| query | sf{small.get('sf')} s | sf{big.get('sf')} s | ratio |")
    print("|---|---|---|---|")
    for n, a, b, r in rows:
        print(f"| {n} | {a:.2f} | {b:.2f} | {r:.2f}× |")
    ratios = sorted(r for _, _, _, r in rows)
    med = ratios[len(ratios) // 2]
    worst = rows[0]
    print(
        f"\n{len(rows)} queries; data ratio {data_ratio:.0f}×; "
        f"median time ratio {med:.2f}×; "
        f"worst {worst[0]} {worst[3]:.2f}×; "
        f"total {small['value']:.1f}s -> {big['value']:.1f}s "
        f"({big['value'] / small['value']:.2f}×)"
    )
    red_line = 2.0 * data_ratio
    bad = [n for n, _, _, r in rows if r > red_line]
    if bad:
        print(f"SUPERLINEAR (> {red_line:.0f}×): {', '.join(bad)}")
        return 1
    print(f"no query exceeds the {red_line:.0f}× superlinear red line")
    return 0


if __name__ == "__main__":
    sys.exit(main())

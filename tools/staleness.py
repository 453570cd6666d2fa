"""Driver-row staleness ledger + rotation planner.

The external driver hash-checks only a ~50-slot PREFIX of
``__spark_entry__._QUERIES`` per round, so registration order is the
freshness budget (VERDICT r07 ask #1: keep >=30 of the ~50 slots on
the oldest-banked rows, cap new registrations). This tool replaces
the by-hand arithmetic that let a 25-query tail go four rounds stale:

  python tools/staleness.py              # histogram + stale tail
  python tools/staleness.py --order      # suggested r(N+1) lead order
  python tools/staleness.py --check 30   # exit 1 if <30 of the first
                                         # 50 slots refresh rows from
                                         # the two oldest banked rounds
  python tools/staleness.py --target 9 --check 25
                                         # evaluate the rotation AS
                                         # PLANNED FOR round 9: only
                                         # artifacts r<9 define the
                                         # stale set (ADVICE r08 —
                                         # without this, the current
                                         # round's artifact landing
                                         # shifts the oldest-two
                                         # window and flips the gate
                                         # after the fact)

Reads every CORRECTNESS_r*.json in the repo root; a query's "newest
driver row" is the highest round whose artifact contains it. Queries
with no row at all (new this round) are listed separately — they MUST
sit inside the prefix.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def newest_rows(target: int | None = None) -> dict[str, int]:
    """Newest driver round per query. With ``target=N``, only
    artifacts from rounds < N count — "the ledger as it stood when
    the round-N rotation was planned" (ADVICE r08: otherwise the
    current round's artifact landing mid-round shifts the oldest-two
    window under the gate)."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if target is not None and rnd >= target:
            continue
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name in data:
            newest[name] = max(newest.get(name, 0), rnd)
    return newest


def main() -> int:
    import __spark_entry__ as E

    order = list(E._QUERIES)
    target = None
    if "--target" in sys.argv:
        target = int(sys.argv[sys.argv.index("--target") + 1])
    newest = newest_rows(target)
    rounds = sorted({r for r in newest.values()})
    hist: dict[int, list[str]] = {}
    never: list[str] = []
    for name in order:
        if name in newest:
            hist.setdefault(newest[name], []).append(name)
        else:
            never.append(name)

    print(f"{len(order)} registered queries; driver rounds seen: {rounds}")
    for rnd in sorted(hist):
        print(f"  newest row r{rnd:02d}: {len(hist[rnd])} queries")
    if never:
        print(f"  NO driver row yet: {len(never)}: {never}")

    oldest_two = sorted(hist)[:2]
    stale = [n for r in oldest_two for n in hist[r]]

    if "--order" in sys.argv:
        fresh_new = never  # must be in prefix: zero-row queries
        rest = [n for n in order if n not in set(stale) | set(fresh_new)]
        rest.sort(key=lambda n: newest.get(n, 99))
        print("\nsuggested lead order (oldest-banked first, then new):")
        for n in stale + fresh_new:
            print(f"  {n}")
        print(f"  ... then {len(rest)} remaining, oldest-first")

    if "--check" in sys.argv:
        floor = int(sys.argv[sys.argv.index("--check") + 1])
        prefix = order[:50]
        refreshing = [n for n in prefix if n in set(stale)]
        ok = len(refreshing) >= floor and all(n in prefix for n in never)
        print(
            f"\nprefix[50] refreshes {len(refreshing)} oldest-banked rows "
            f"(floor {floor}); zero-row queries in prefix: "
            f"{all(n in prefix for n in never)}"
        )
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

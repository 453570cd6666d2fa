"""Spot scaling tier: bench-protocol timings for a named query subset
at one sf dir — the one-notch-up instrument behind BASELINE.md's sf3
spot tiers (VERDICT r08 ask #5 / r09 ask #3).

Same protocol as bench.py (this matters for comparability): warm JVM
via a group_agg run, per-query cache isolation (clearCache + index/
cluster memo eviction), median of 3 fully-executed runs through the
noop sink. Run it co-paired — same machine state, sf1 then sf3 —
and keep the machine otherwise quiescent.

Usage:
  python tools/spot_tier.py SF_DIR query [query ...]
Prints one JSON line: {"sf_dir": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    from bench import RUNS, force

    import __spark_entry__ as E
    from cs422pp_mapreduce_spark.operators.dedup import evict_cluster_cache
    from cs422pp_mapreduce_spark.operators.similarity import (
        evict_index_caches,
    )
    from cs422pp_mapreduce_spark.session import evict_scratch, get_spark

    spark = get_spark("spot_tier")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    force(qs["group_agg"](spark, sf_dir))  # JVM + footer warmup

    times: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        evict_index_caches(spark)
        evict_cluster_cache(spark)
        evict_scratch(spark)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 3)
    print(json.dumps({"sf_dir": sf_dir, "queries": times}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Settle-recipe re-pin instrument (BASELINE.md measurement
discipline): quiescent single-op FRESH-BUILD median + same-DataFrame
re-collect split, for sub-second rows whose in-suite ratios are
planning-dominated and drift ±2× without meaning.

For each named query:
  * N fresh builds: construct the DataFrame from scratch and run it to
    completion through the noop sink, cache-isolated (clearCache +
    index/cluster/scratch memo eviction) — the per-sample wall
    includes planning + codegen + execution;
  * then ONE extra build kept alive and re-collected: the re-collect
    wall is ~pure execution, so (median fresh − re-collect) is the
    planning/codegen share. A future EXECUTION regression is visible
    through planning noise.

Usage:
  python tools/settle.py SF_DIR query [query ...]
Prints one JSON line:
  {"sf_dir": ..., "queries": {name: {"fresh": [...], "median": s,
                                      "recollect": s}}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = 5


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    from bench import force

    import __spark_entry__ as E
    from cs422pp_mapreduce_spark.operators.dedup import evict_cluster_cache
    from cs422pp_mapreduce_spark.operators.similarity import (
        evict_index_caches,
    )
    from cs422pp_mapreduce_spark.session import evict_scratch, get_spark

    spark = get_spark("settle")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    force(qs["group_agg"](spark, sf_dir))  # JVM + footer warmup

    out: dict[str, dict] = {}
    for name in names:
        fresh: list[float] = []
        for _ in range(SAMPLES):
            spark.catalog.clearCache()
            evict_index_caches(spark)
            evict_cluster_cache(spark)
            evict_scratch(spark)
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            fresh.append(round(time.perf_counter() - t0, 3))
        # re-collect: same DataFrame, planning already done
        spark.catalog.clearCache()
        evict_index_caches(spark)
        evict_cluster_cache(spark)
        evict_scratch(spark)
        df = qs[name](spark, sf_dir)
        force(df)
        t0 = time.perf_counter()
        force(df)
        recollect = round(time.perf_counter() - t0, 3)
        out[name] = {
            "fresh": fresh,
            "median": round(statistics.median(fresh), 3),
            "recollect": recollect,
        }
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()

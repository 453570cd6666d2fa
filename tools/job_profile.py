#!/usr/bin/env python3
"""Per-query driver-pacing profile: job count + job-active seconds.

Runs each named query with the Spark UI's REST API enabled and, per
fresh cache-isolated build, reports:

  * wall seconds (build + noop force),
  * number of jobs the build+force submitted,
  * job-active seconds = Σ (completion − submission) over those jobs
    (concurrent jobs double-count — deliberately: the metric tracks
    scheduled work, while wall − active ≈ driver-side planning gaps
    when jobs are sequential),
  * the top-5 longest jobs (description truncated).

This is the instrument behind the r14 dedup_suffix/graph/ann work
(VERDICT r13 asks #1/#4/#5 measure "listener job count and job-active
seconds"). Usage:

  python tools/job_profile.py SF_DIR query [query ...]

Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = int(os.environ.get("JOB_PROFILE_SAMPLES", "3"))
UI_PORT = int(os.environ.get("JOB_PROFILE_UI_PORT", "4050"))


def _get(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _parse_ts(s: str) -> float:
    # "2026-08-18T04:19:39.123GMT"
    from datetime import datetime, timezone

    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]

    from pyspark.sql import SparkSession

    from cs422pp_mapreduce_spark.session import (
        RUNTIME_CONFS,
        default_parallelism,
    )

    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName("job_profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedJobs", "100000")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from bench import force
    from cs422pp_mapreduce_spark.operators.dedup import evict_cluster_cache
    from cs422pp_mapreduce_spark.operators.similarity import (
        evict_index_caches,
    )
    from cs422pp_mapreduce_spark.session import evict_scratch

    qs = E.queries()
    force(qs["group_agg"](spark, sf_dir))  # JVM + footer warmup
    app_id = _get("applications")[0]["id"]

    for name in names:
        samples = []
        for _ in range(SAMPLES):
            spark.catalog.clearCache()
            evict_index_caches(spark)
            evict_cluster_cache(spark)
            evict_scratch(spark)
            before = {j["jobId"] for j in _get(f"applications/{app_id}/jobs")}
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            wall = time.perf_counter() - t0
            jobs = [
                j
                for j in _get(f"applications/{app_id}/jobs")
                if j["jobId"] not in before
            ]
            durs = []
            for j in jobs:
                if "completionTime" in j and "submissionTime" in j:
                    durs.append(
                        (
                            j["jobId"],
                            _parse_ts(j["completionTime"])
                            - _parse_ts(j["submissionTime"]),
                            (j.get("description") or j.get("name", ""))[:60],
                        )
                    )
            durs.sort(key=lambda x: -x[1])
            samples.append(
                {
                    "wall": round(wall, 3),
                    "n_jobs": len(jobs),
                    "job_active": round(sum(d for _, d, _ in durs), 3),
                    "top_jobs": [
                        {"id": i, "sec": round(d, 3), "desc": desc}
                        for i, d, desc in durs[:5]
                    ],
                }
            )
        print(
            json.dumps({"query": name, "sf_dir": sf_dir, "samples": samples})
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dump .explain("formatted") for named queries to files.

Usage:
  python tools/dump_plan.py SF_DIR OUT_DIR SUFFIX query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query. Queries with
analysis twins (streaming contracts, driver-paced builders) use the
lazy twin so nothing executes; everything else uses the registered
builder directly (plan construction only — the noop sink is never
invoked).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir, out_dir, suffix, names = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        sys.argv[4:],
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from cs422pp_mapreduce_spark.plans.analysis import (
        analysis_plan_builders,
    )
    from cs422pp_mapreduce_spark.plans.explain import explain_str
    from cs422pp_mapreduce_spark.session import get_spark

    spark = get_spark("dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    twins = analysis_plan_builders()

    for name in names:
        fn = twins.get(name, qs.get(name))
        if fn is None:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            if name in twins:
                fh.write(
                    f"# NOTE: analysis twin plan for {name} (the real "
                    "query executes streaming/driver-paced work at "
                    "build time; this is the representative lazy "
                    "plan, same convention as tools/audit_plans.py)\n"
                )
            fh.write(explain_str(df))
        print(path)


if __name__ == "__main__":
    main()

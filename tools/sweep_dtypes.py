"""Oracle↔Spark output-dtype sweep (VERDICT r03 "Next round" item 2).

The driver hashes SERIALIZED values under name-sorted columns, so two
whole classes of defect survive numeric-tolerant local checks yet go
red at the driver:

1. kind drift — DuckDB ``SUM(integer)`` returns HUGEINT, which pandas
   materializes as float64 (785.0) while Spark's ``sum(long)`` stays
   int64 (785): serialized ``'785.0' != '785'`` (r03: funnel, and
   latent in tpch_q12 / curation_report). Convention: route integral
   SUMs through ``oracles._isum`` / ``CAST(... AS BIGINT)``.
2. collection columns — the driver's canonicalizer crashes sorting
   raw array cells (r03: inverted_index, map_funcs). Convention:
   serialize via ``array_join`` (q_collect_agg, relational.py).

This sweep catches both WITHOUT executing Spark: the Spark side is
pure plan analysis (``fn(spark, sf).schema``; streaming contract
queries are analyzed via their un-started plan builders), the DuckDB
side runs each oracle at the given sf dir (default sf0.01 — the
driver's comparison scale, so the nullable-int exemption below sees
the same data the driver does) and inspects the materialized dtypes.

Usage: python tools/sweep_dtypes.py [sf_dir] [query ...]
Exit 1 on any violation — wire it into the gate next to pytest and
tools/audit_plans.py.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Spark typeName() → pandas dtype.kind values the driver serializes
# identically. Anything outside the map (array/map/struct/binary/
# decimal in OUTPUT position) is a violation by itself.
_KIND_OK = {
    "byte": {"i", "u"},
    "short": {"i", "u"},
    "integer": {"i", "u"},
    "long": {"i", "u"},
    "float": {"f"},
    "double": {"f"},
    "string": {"O"},
    "boolean": {"b"},
    "timestamp": {"M"},
    "timestamp_ntz": {"M"},
    # DateType: Spark toPandas yields datetime.date objects ('O'),
    # DuckDB DATE yields datetime64 ('M') — serializations differ
    # ('2020-01-01' vs '2020-01-01 00:00:00'). Engine convention is
    # to CAST dates to TIMESTAMP in final output; flag raw dates.
}


def sweep(sf_dir: str, only: set[str]) -> int:
    import __spark_entry__ as E
    from cs422pp_mapreduce_spark.session import get_spark

    spark = get_spark("sweep-dtypes")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from cs422pp_mapreduce_spark.plans.analysis import analysis_plan_builders

    plan_twins = analysis_plan_builders()
    qs, oracles = E.queries(), E.oracle_sql()
    violations: list[str] = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # streaming/driver-paced queries: take the schema from the
        # lazy plan twin (identical to the real output schema)
        # instead of executing jobs at plan-build time
        fn = plan_twins.get(name, fn)
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            violations.append(f"{name}: spark plan analysis failed: {exc!r}")
            continue
        probs: list[str] = []
        spark_kinds: dict[str, set[str]] = {}
        for f in schema.fields:
            t = f.dataType.typeName()
            if t not in _KIND_OK:
                probs.append(
                    f"spark column {f.name!r} has driver-unsafe type {t} "
                    "(serialize collections via array_join; cast dates to "
                    "timestamp; cast decimals to double)"
                )
            else:
                spark_kinds[f.name] = _KIND_OK[t]
        if name in oracles:
            try:
                ddf = con.sql(oracles[name]).df()
            except Exception as exc:  # noqa: BLE001
                probs.append(f"oracle failed on DuckDB: {exc!r}")
                ddf = None
            if ddf is not None:
                if sorted(ddf.columns) != sorted(f.name for f in schema.fields):
                    probs.append(
                        f"column sets differ: spark="
                        f"{sorted(f.name for f in schema.fields)} "
                        f"duck={sorted(ddf.columns)}"
                    )
                else:
                    for c, okkinds in spark_kinds.items():
                        dk = ddf[c].dtype.kind
                        if dk == "O":
                            # full-column scan (ADVICE r04) — see
                            # check_oracles.collection_columns
                            cells = ddf[c].dropna()
                            if any(
                                isinstance(v, (np.ndarray, list, dict))
                                for v in cells
                            ):
                                probs.append(
                                    f"oracle column {c!r} materializes "
                                    "collections (driver canonicalizer "
                                    "crash)"
                                )
                                continue
                        if dk not in okkinds:
                            if (
                                dk == "f"
                                and okkinds == {"i", "u"}
                                and bool(ddf[c].isna().any())
                            ):
                                # nullable integral with actual NULLs:
                                # pandas materializes float64 on BOTH
                                # engines (Spark toPandas included), so
                                # serializations agree — not a drift
                                # (r01 null_handling is driver-green
                                # exactly this way).
                                continue
                            probs.append(
                                f"kind drift on {c!r}: spark kinds "
                                f"{sorted(okkinds)} vs duck dtype "
                                f"{ddf[c].dtype} — serialized values will "
                                "hash-differ (use _isum / explicit CASTs)"
                            )
        n_checked += 1
        if probs:
            violations.extend(f"{name}: {p}" for p in probs)
            print(f"  {name:22s} VIOLATION")
            for p in probs:
                print(f"      !! {p}")

    print(f"\nswept {n_checked} queries: "
          f"{len(violations)} violation(s)")
    return 1 if violations else 0


if __name__ == "__main__":
    # default to sf0.01 — the driver's comparison scale, so the
    # null-occurrence exemption above sees the same data the driver does
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(sweep(sf, set(sys.argv[2:])))

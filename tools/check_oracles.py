"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares
row count, (name-sorted) column names, and values order-insensitively
— exact equality, no tolerance: the engine's determinism conventions
(oracles.py) are supposed to make results bit-identical.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
        if df[c].dtype == np.float64:
            # normalize IEEE -0.0 → +0.0: numerically equal values must
            # stringify identically or the row sort diverges per engine
            df[c] = df[c] + 0.0
    if len(df):
        key = df.astype(str)
        order = key.sort_values(by=list(df.columns)).index
        df = df.loc[order].reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canonical(spark_df), canonical(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype == np.float64 or bv.dtype == np.float64:
            an, bn = av.isna(), bv.isna()
            if not an.equals(bn):
                problems.append(f"{c}: null mask differs")
                continue
            diff = (av.fillna(0) - bv.fillna(0)).abs()
            mx = float(diff.max()) if len(diff) else 0.0
            if mx != 0.0:
                problems.append(f"{c}: max abs diff {mx:.3e}")
        else:
            if not av.equals(bv):
                neq = (av.astype(str) != bv.astype(str))
                idx = int(neq.idxmax())
                problems.append(
                    f"{c}: values differ, first at row {idx}: "
                    f"spark={av.iloc[idx]!r} duck={bv.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from cs422pp_mapreduce_spark.session import get_spark

    spark = get_spark("check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failed, rows_only = [], []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            rows_only.append(name)
            print(f"  {name:20s} rows-only: {len(sdf)} rows ({t1 - t0:.1f}s)")
            continue
        ddf = con.sql(oracles[name]).df()
        problems = compare(name, sdf, ddf)
        status = "OK " if not problems else "FAIL"
        print(f"  {name:20s} {status} {len(sdf):>8} rows  spark={t1 - t0:.1f}s")
        for p in problems:
            print(f"      !! {p}")
        if problems:
            failed.append(name)

    print(f"\n{n_run - len(failed) - len(rows_only)} OK, "
          f"{len(failed)} FAIL, {len(rows_only)} rows-only")
    if failed:
        print("FAILED:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

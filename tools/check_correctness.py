"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf dir, compare
oracle-backed ones against DuckDB (row count, column names, and
order-insensitive value equality), report rows-only counts otherwise.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                import numpy as np

                if not np.allclose(
                    a[c].astype(float), b[c].astype(float), rtol=0, atol=0, equal_nan=True
                ):
                    bad = (a[c].astype(float) != b[c].astype(float)).sum()
                    problems.append(f"column {c}: {bad} value mismatches (float exact)")
            else:
                if not a[c].equals(b[c]):
                    bad = (a[c] != b[c]).sum()
                    problems.append(f"column {c}: {bad} value mismatches")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from datasketches_java_spark.session import get_spark

    spark = get_spark(app="check_correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name in oracles:
            try:
                odf = con.sql(oracles[name]).df()
            except Exception as e:
                print(f"FAIL  {name}: oracle error: {e}")
                failures += 1
                continue
            problems = compare(sdf, odf)
            if problems:
                failures += 1
                print(f"FAIL  {name} ({len(sdf)} rows, {el:.1f}s): " + "; ".join(problems))
            else:
                print(f"OK    {name} ({len(sdf)} rows, {el:.1f}s, oracle match)")
        else:
            print(f"ROWS  {name} ({len(sdf)} rows, {el:.1f}s, no oracle)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

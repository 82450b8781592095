#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Loads each <name> parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over views named
after the testdata tables, and compares (column names sorted, rows
sorted, values normalized) — flags any mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # decimals/objects → canonical string; floats rounded for display
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def driver_sort(df: pd.DataFrame) -> None:
    """Reproduce the driver gate's RAW lexsort (no repr normalization).

    The driver sorts the result frame's raw values before hashing; an
    array/map/struct column raises "unhashable type: 'numpy.ndarray'"
    there, failing the query outright. Round 5 shipped four red rows
    because this script repr-normalized FIRST and so passed locally
    where the driver crashed — run the raw sort up front so local green
    predicts driver green.
    """
    df[sorted(df.columns)].sort_values(by=sorted(df.columns))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            driver_sort(got)
            driver_sort(exp)
        except Exception as e:
            print(f"FAIL {name}: driver-compat raw sort crashed "
                  f"(the driver gate would fail this query): {e}")
            n_bad += 1
            continue
        g, x = normalize(got), normalize(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_bad += 1
        elif len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_bad += 1
        elif not g.equals(x):
            diff = (g != x).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, e.g.:")
            for i in idx:
                print(f"  spark : {g.loc[i].to_dict()}")
                print(f"  duckdb: {x.loc[i].to_dict()}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

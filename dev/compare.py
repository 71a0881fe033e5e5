#!/usr/bin/env python3
"""Dev-only harness emulating the driver's DuckDB-oracle compare.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the same
parquet tables, and reports row/schema/value diffs. NOT part of the shipped
library (the Scala engine never depends on this)."""
import json
import sys
import duckdb
import pandas as pd
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            fails += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            fails += 1
            continue
        gs = got.astype(str)
        ws = want.astype(str)
        if not gs.equals(ws):
            neq = (gs != ws).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} differing rows, first:")
            idx = neq[neq].index[0]
            print("  spark:", got.loc[idx].to_dict())
            print("  duck :", want.loc[idx].to_dict())
            fails += 1
            continue
        print(f"OK   {name}: {len(got)} rows")
    return fails


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the parquet tables in <sfDir>, loads the
corresponding Spark result parquet, sorts columns by name, and compares
values cell-exactly. Dev tooling only — the shipped library has no
Python dependency.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(sqls.items()):
        try:
            mine = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        mine, ref = normalize(mine), normalize(ref)
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL  {name}: columns {list(mine.columns)} "
                  f"!= {list(ref.columns)}")
            failures += 1
            continue
        if mine.shape != ref.shape:
            print(f"FAIL  {name}: shape {mine.shape} != {ref.shape}")
            failures += 1
            continue
        neq = (mine != ref) & ~(mine.isna() & ref.isna())
        if neq.any().any():
            bad_cols = [c for c in mine.columns if neq[c].any()]
            ridx = neq.any(axis=1).idxmax()
            print(f"FAIL  {name}: {int(neq.sum().sum())} cells differ in "
                  f"{bad_cols}; first row {ridx}:")
            print("  mine:", mine.loc[ridx].to_dict())
            print("  ref :", ref.loc[ridx].to_dict())
            failures += 1
        else:
            print(f"OK    {name} ({len(mine)} rows, {len(mine.columns)} cols)")
    print(f"\n{len(sqls) - failures}/{len(sqls)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
       python3 tools/compare_oracle.py --selftest

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the parquet tables in <sfDir>, loads the
corresponding Spark result parquet, sorts columns by name, and compares
DECLARED TYPES FIRST, then values cell-exactly. The type compare exists
because the driver's hash is type-sensitive: a DuckDB HUGEINT (from
SUM over INTEGER/BIGINT) vs a Spark BIGINT, or a Spark DECIMAL(28,6)
(from a decimal literal division) vs a DuckDB DOUBLE, hash-mismatch even
when every cell prints identically — the round-8 failure class that a
pandas-coerced value compare is blind to. Timestamp flavors (TZ/NTZ/ns)
are normalized to one token since the driver's compare tolerates them
(every timestamp-bearing query hash-matches across rounds).

`--selftest` proves the gate catches the class: it builds a BIGINT-typed
parquet and compares it against a SUM() oracle (HUGEINT) — the tool must
FAIL that probe, and must PASS the same probe with the oracle cast to
BIGINT. Dev tooling only — the shipped library has no Python dependency.
"""
import json
import os
import sys
import tempfile

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


def norm_type(t) -> str:
    """Normalize a DuckDB type to the granularity the driver's hash is
    sensitive to, calibrated against CORRECTNESS_r08: HUGEINT != BIGINT
    and DECIMAL(p,s) != DOUBLE both hash-FAILED there, while
    BIGINT-vs-INTEGER (q_scalar_array) and TIMESTAMP-vs-DATE
    (q_scalar_date) both hash-PASSED — consistent with a pandas-level
    compare where all signed ints <= 64-bit render identically and
    dates coerce to datetimes, but HUGEINT/DECIMAL leave the int64/
    float64 lanes."""
    s = str(t).upper()
    if s.startswith("TIMESTAMP") or s == "DATE":
        return "DATETIME"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "INT64CLASS"
    return s


def rel_types(rel):
    """(sorted-by-name) [(col, normalized type)] for a duckdb relation."""
    pairs = sorted(zip(rel.columns, rel.types), key=lambda p: p[0])
    return [(c, norm_type(t)) for c, t in pairs]


def compare_one(con, name, sql, parquet_glob) -> str:
    """Return '' on match, else a failure description."""
    # everything stays inside the try: con.sql() only parses/binds —
    # data-dependent errors (bad cast, overflow, corrupt part file)
    # surface at .df() execution, and ONE broken oracle must record a
    # FAIL row, never abort the remaining comparisons
    try:
        mine_rel = con.sql(f"SELECT * FROM '{parquet_glob}'")
        ref_rel = con.sql(sql)
        mt, rt = rel_types(mine_rel), rel_types(ref_rel)
        if [c for c, _ in mt] != [c for c, _ in rt]:
            return (f"columns {[c for c, _ in mt]} != {[c for c, _ in rt]}")
        bad_types = [(c, a, b) for (c, a), (_, b) in zip(mt, rt) if a != b]
        if bad_types:
            return ("declared-type mismatch (spark vs oracle): " + ", ".join(
                f"{c}: {a} != {b}" for c, a, b in bad_types))
        mine, ref = normalize(mine_rel.df()), normalize(ref_rel.df())
        if mine.shape != ref.shape:
            return f"shape {mine.shape} != {ref.shape}"
        neq = (mine != ref) & ~(mine.isna() & ref.isna())
        if neq.any().any():
            bad_cols = [c for c in mine.columns if neq[c].any()]
            ridx = neq.any(axis=1).idxmax()
            return (f"{int(neq.sum().sum())} cells differ in {bad_cols}; "
                    f"first row {ridx}: mine={mine.loc[ridx].to_dict()} "
                    f"ref={ref.loc[ridx].to_dict()}")
        return ""
    except Exception as e:
        return f"{type(e).__name__}: {e}"


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(sqls.items()):
        err = compare_one(con, name, sql, f"{out_dir}/{name}/*.parquet")
        if err:
            print(f"FAIL  {name}: {err}")
            failures += 1
        else:
            print(f"OK    {name}")
    print(f"\n{len(sqls) - failures}/{len(sqls)} oracle queries match")
    return 1 if failures else 0


def selftest() -> int:
    """The gate must FAIL a value-identical HUGEINT-vs-BIGINT probe and
    PASS the same probe once the oracle casts to BIGINT."""
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/probe")
        # Spark-side stand-in: a BIGINT column written to parquet.
        con.sql("COPY (SELECT CAST(6 AS BIGINT) AS s) TO "
                f"'{d}/probe/part-0.parquet' (FORMAT PARQUET)")
        hug = "SELECT SUM(x) AS s FROM (SELECT 1 AS x UNION ALL " \
              "SELECT 2 UNION ALL SELECT 3)"  # SUM(int) -> HUGEINT
        big = f"SELECT CAST(({hug.replace(' AS s ', ' ')}) AS BIGINT) AS s"
        err_hug = compare_one(con, "probe", hug, f"{d}/probe/*.parquet")
        err_big = compare_one(con, "probe", big, f"{d}/probe/*.parquet")
    ok = ("declared-type mismatch" in err_hug) and (err_big == "")
    print(f"selftest hugeint-probe: {'caught' if err_hug else 'MISSED'}"
          f" ({err_hug or 'no error'})")
    print(f"selftest bigint-probe : {'clean' if not err_big else 'FALSE FAIL'}"
          f" ({err_big or 'no error'})")
    print("SELFTEST " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))

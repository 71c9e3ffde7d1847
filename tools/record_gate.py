#!/usr/bin/env python3
"""Record an out-of-protocol oracle-gate run as a JSON artifact.

The driver's gate runs at sf0.01; scale-dependent divergences (the
round-9 bigram-LM rounding tie) only surface at bigger row counts, so
each round also runs the gate at the rehearsal SF and records the
result here (round-11 judge item #2 institutionalized).

Usage: python3 tools/record_gate.py <sfDir> <verifyOutDir> <outJson> [label]
  e.g. python3 tools/record_gate.py /tmp/testdata/sf1 /tmp/vsf1 \
         CORRECTNESS_SF1.json sf1-heavy-families

Reuses compare_oracle's type-aware comparator verbatim, so a pass here
means exactly what a driver-gate pass means.
"""
import json
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import compare_oracle as co  # noqa: E402


def main(sf_dir: str, out_dir: str, out_json: str, label: str) -> int:
    con = duckdb.connect()
    for t in co.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    res = {}
    for name, sql in sorted(sqls.items()):
        err = co.compare_one(con, name, sql, f"{out_dir}/{name}/*.parquet")
        res[name] = {"match": err == "", "err": err or None}
        print(f"FAIL  {name}: {err}" if err else f"OK    {name}")
    n_ok = sum(1 for v in res.values() if v["match"])
    artifact = {
        "label": label,
        "sf_dir": sf_dir,
        "n": len(res),
        "n_match": n_ok,
        "queries": res,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"\n{n_ok}/{len(res)} match -> {out_json}")
    return 1 if n_ok < len(res) else 0


if __name__ == "__main__":
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  sys.argv[4] if len(sys.argv) > 4 else "out-of-protocol"))

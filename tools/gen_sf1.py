#!/usr/bin/env python3
"""Synthesize an sf1 fixture set (10x sf0.1) for the scale rehearsal.

The driver's generators are not recorded in-repo, so this builds sf1 by
REPLICATING sf0.1 ten times with disjoint key offsets - preserving every
marginal distribution, key fan-out, and skew profile exactly - while
breaking the artifacts replication would otherwise inject:

 - documents: replica 0 keeps the original text; replicas 1-9 get a
   deterministic per-replica word shuffle (length and vocabulary
   preserved, shingle sets destroyed), so near-dup pair counts grow
   ~linearly with the corpus instead of the 45x blowup exact copies
   would cause and the dedup-family scaling read stays honest.
 - embeddings: per-replica cyclic rotation of the vector (norms and
   within-replica geometry preserved; replicas are not near-dups).
 - region/nation: fixed dimension tables, copied as-is (they do not
   scale with SF in TPC-H either).

Deterministic (md5-keyed shuffle, no RNG state). Output is parquet per
table under the target dir; intended target: /tmp/testdata/sf1 (the
repo's testdata is read-only).

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir] [replicas]
"""
import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def off(table, col):
    """Power-of-ten offset strictly above the column's max."""
    mx = con.sql(f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    o = 1
    while o <= mx:
        o *= 10
    return o


OK = off("orders", "o_orderkey")
CK = off("customer", "c_custkey")
SK = off("supplier", "s_suppkey")
PK = off("part", "p_partkey")
EV = off("events", "event_id")
UU = off("events", "user_id")
DK = off("documents", "doc_id")
VK = off("embeddings", "vec_id")

# fixed dimensions
for t in ("region", "nation"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)")

REPL = f"(SELECT range AS r FROM range({R}))"

con.sql(f"""COPY (
  SELECT c_custkey + r*{CK} AS c_custkey, c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', {REPL}
) TO '{DST}/customer.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT s_suppkey + r*{SK} AS s_suppkey, s_name,
         s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', {REPL}
) TO '{DST}/supplier.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT p_partkey + r*{PK} AS p_partkey, p_name, p_brand,
         p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', {REPL}
) TO '{DST}/part.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT o_orderkey + r*{OK} AS o_orderkey,
         o_custkey + r*{CK} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', {REPL}
) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT l_orderkey + r*{OK} AS l_orderkey,
         l_partkey + r*{PK} AS l_partkey,
         l_suppkey + r*{SK} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', {REPL}
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT event_id + r*{EV} AS event_id, ts,
         user_id + r*{UU} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet', {REPL}
) TO '{DST}/events.parquet' (FORMAT PARQUET)""")

# documents: per-replica deterministic word shuffle (replica 0 original)
docs = con.sql(f"SELECT * FROM '{SRC}/documents.parquet'").df()
out = []
for r in range(R):
    d = docs.copy()
    d["doc_id"] = d["doc_id"] + r * DK
    if r > 0:
        def shuffle(text, rr=r):
            words = text.split(" ")
            keyed = sorted(
                (hashlib.md5(f"{rr}|{i}|{w}".encode()).hexdigest(), w)
                for i, w in enumerate(words))
            return " ".join(w for _, w in keyed)
        d["text"] = d["text"].map(shuffle)
    d["n_chars"] = d["text"].str.len().astype("int64")
    out.append(d)
docs_all = pd.concat(out, ignore_index=True)
con.register("docs_all", docs_all)
con.sql(f"COPY (SELECT * FROM docs_all) TO '{DST}/documents.parquet' "
        f"(FORMAT PARQUET)")

# embeddings: per-replica cyclic rotation of the vector
emb = con.sql(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
eout = []
for r in range(R):
    e = emb.copy()
    e["vec_id"] = e["vec_id"] + r * VK
    if r > 0:
        e["embedding"] = e["embedding"].map(
            lambda v, rr=r: np.roll(np.asarray(v, dtype=np.float32), rr))
    eout.append(e)
emb_all = pd.concat(eout, ignore_index=True)
con.register("emb_all", emb_all)
con.sql(f"COPY (SELECT vec_id, embedding, label FROM emb_all) TO "
        f"'{DST}/embeddings.parquet' (FORMAT PARQUET)")

for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("done ->", DST)

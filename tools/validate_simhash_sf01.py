#!/usr/bin/env python3
"""sf0.1 validation for q_simhash_pairs / q_simhash_cc.

The stock oracle for q_simhash_cc is a recursive transitive-closure
CTE; its `reach` relation enumerates node x reachable-node pairs, which
goes quadratic in the largest cluster and runs >80 min at sf0.1 (the
round-7 validation gap).  The engine is not the bottleneck — the oracle
is.  This validator keeps the oracle EXACT but cheap:

  1. q_simhash_pairs: run its oracle SQL as-is in DuckDB (banded
     signature join — tractable at any sf) and compare to the Spark
     dump; the materialized pair table is reused for step 2.
  2. q_simhash_cc: union-find over the oracle pair table (linear-ish in
     edges, instant for ~10^5 pairs), then component = min doc_id,
     cluster_sz, is_keeper — the exact semantics of the recursive CTE,
     computed the way a harness should.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v01 q_simhash_pairs,q_simhash_cc"
  python3 tools/validate_simhash_sf01.py /root/testdata/sf0.1 /tmp/v01
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def spark_df(q):
    return pd.concat([pd.read_parquet(f)
                      for f in sorted(glob.glob(f"{out_dir}/{q}/*.parquet"))])


def compare(q, sdf, odf):
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {q}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
        return False
    if len(sdf) != len(odf):
        print(f"FAIL {q}: rows spark={len(sdf)} oracle={len(odf)}")
        return False
    ss = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    oo = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    for c in ss.columns:  # dtype-tolerant exact compare, as check.py
        if not ss[c].reset_index(drop=True).equals(
                oo[c].astype(ss[c].dtype).reset_index(drop=True)):
            print(f"FAIL {q}: values differ in column {c}")
            return False
    print(f"OK   {q} ({len(sdf)} rows)")
    return True


# --- 1. pairs: stock oracle, materialized once -----------------------
con.sql(f"CREATE TABLE pairs_oracle AS {oracle['q_simhash_pairs']}")
pairs = con.sql("SELECT * FROM pairs_oracle").df()
ok = compare("q_simhash_pairs", spark_df("q_simhash_pairs"), pairs)

# --- 2. cc: union-find over the SAME pair table ----------------------
parent = {}


def find(x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != x:  # path compression
        parent[x], x = root, parent[x]
    return root


for u, v in zip(pairs["d1"].to_numpy(), pairs["d2"].to_numpy()):
    ru, rv = find(int(u)), find(int(v))
    if ru != rv:
        # union by MIN id so the representative is the component min,
        # exactly the recursive oracle's least(node, min(reachable))
        lo, hi = (ru, rv) if ru < rv else (rv, ru)
        parent[hi] = lo

nodes = sorted(set(pairs["d1"]).union(set(pairs["d2"])))
lab = pd.DataFrame({
    "doc_id": [int(n) for n in nodes],
    "component": [find(int(n)) for n in nodes],
})
szs = lab.groupby("component").size().rename("cluster_sz").reset_index()
cc = lab.merge(szs, on="component")
cc["is_keeper"] = (cc["doc_id"] == cc["component"]).astype("int64")
cc["cluster_sz"] = cc["cluster_sz"].astype("int64")
ok = compare("q_simhash_cc", spark_df("q_simhash_cc"), cc) and ok

print("\nsf0.1 simhash validation:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)

#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the raw tables, and
compares schema + values (columns sorted by name, rows sorted).
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
ok = fail = 0
for q, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {q}: no spark output"); fail += 1; continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_dir}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {q}: spark read: {e}"); fail += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: oracle error: {str(e)[:200]}"); fail += 1; continue
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {q}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}"); fail += 1; continue
    if len(sdf) != len(odf):
        print(f"FAIL {q}: rows spark={len(sdf)} oracle={len(odf)}"); fail += 1; continue
    dtypes_mismatch = [(c, str(sdf[c].dtype), str(odf[c].dtype)) for c in sdf.columns
                       if str(sdf[c].dtype) != str(odf[c].dtype)]
    ss = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    oo = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    try:
        eq = ss.equals(oo)
        if not eq:
            # pinpoint first differing cell
            diffcols = [c for c in ss.columns if not ss[c].equals(oo[c])]
            msg = []
            for c in diffcols[:3]:
                neq = (ss[c] != oo[c]) & ~(ss[c].isna() & oo[c].isna())
                i = neq.idxmax() if neq.any() else None
                if i is not None:
                    msg.append(f"{c}[{i}]: spark={ss[c][i]!r} oracle={oo[c][i]!r} (n_diff={int(neq.sum())})")
            print(f"FAIL {q}: values differ: {'; '.join(msg)}")
            if dtypes_mismatch: print(f"      dtypes: {dtypes_mismatch}")
            fail += 1; continue
    except Exception as e:
        print(f"FAIL {q}: compare error: {e}"); fail += 1; continue
    note = f" [dtype mismatch: {dtypes_mismatch}]" if dtypes_mismatch else ""
    print(f"OK   {q} ({len(sdf)} rows){note}")
    ok += 1
print(f"\n{ok} OK, {fail} FAIL")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Derive an sf1-scale bench replica from the driver's sf0.1 tables.

The driver generates sf{0.001,0.01,0.1} only; the sf1 row in
BASELINE.md measures SCALING of the iterative / layout-building
operators, so a mechanically derived 10x replica is sufficient (and
is used for bench timing only — the correctness gate stays on driver
data).

Derivation (deterministic, no RNG):
- documents: 10 copies, doc_id += i*5000. Copy i>0 suffixes every
  word with _i, which decorrelates shingles/minhash/simhash ACROSS
  copies while preserving the duplicate structure WITHIN each copy —
  near-dup density per document stays constant as the corpus grows,
  which is the honest scaling shape (a naive 10x copy would instead
  create 10-wide duplicate cliques and measure a pathological
  worst case).
- events: 10 copies, event_id += i*100000, user_id += i*1500
  (event_id drives the synthetic x/y lattice, so each copy lands on
  fresh points; same time span at 10x density).
- lineitem: 10 copies, l_orderkey += i*150000.

Usage: python3 tools/make_sf1.py [outDir]   (default target/sf1)
"""
import sys, os
import duckdb

src = "/root/testdata/sf0.1"
out = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql("PRAGMA threads=16")

def tenfold(table, select_i):
    parts = " UNION ALL ".join(select_i(i) for i in range(10))
    con.sql(f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

BSL = "\\1_"  # duckdb regex backref; f-strings refuse inline backslashes

tenfold("documents", lambda i: f"""
  SELECT doc_id + {i*5000} AS doc_id,
         {"text" if i == 0 else f"regexp_replace(text, '([A-Za-z0-9]+)', '{BSL}{i}', 'g')"} AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet')""")

tenfold("events", lambda i: f"""
  SELECT event_id + {i*100000} AS event_id, ts,
         user_id + {i*1500} AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet')""")

tenfold("lineitem", lambda i: f"""
  SELECT l_orderkey + {i*150000} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet')""")

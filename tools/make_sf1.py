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

# --- round 12: the remaining tables, so the FULL oracle gate can run
# at sf1 (verdict item 3).  Same determinism rules; dimension keys
# offset per copy, fact FKs left pointing at copy-0 dims (the gate
# compares Spark vs DuckDB on identical inputs, so any consistent
# dataset is valid).  region/nation are fixed-cardinality dims —
# copied as-is.

tenfold("customer", lambda i: f"""
  SELECT c_custkey + {i*15000} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM read_parquet('{src}/customer.parquet')""")

tenfold("orders", lambda i: f"""
  SELECT o_orderkey + {i*150000} AS o_orderkey, o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet')""")

tenfold("supplier", lambda i: f"""
  SELECT s_suppkey + {i*1000} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM read_parquet('{src}/supplier.parquet')""")

tenfold("part", lambda i: f"""
  SELECT p_partkey + {i*20000} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM read_parquet('{src}/part.parquet')""")

# embeddings: an additive per-copy offset decorrelates the copies
# (a uniform SCALE would be invisible to cosine); dimension unchanged
tenfold("embeddings", lambda i: f"""
  SELECT vec_id + {i*2000} AS vec_id,
         CAST(list_transform(embedding, x -> x + {i} * 0.003) AS FLOAT[]) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet')""")

for small in ("region", "nation"):
    con.sql(f"COPY (SELECT * FROM read_parquet('{src}/{small}.parquet')) "
            f"TO '{out}/{small}.parquet' (FORMAT PARQUET)")
    print(f"{small}: copied")

#!/usr/bin/env python3
"""Density-preserving 10x replication of the sf0.1 tables the round-8d
scale probes touch (orders, lineitem, part, embeddings — documents and
events have their own tools, reused here into the same output dir;
part added in round 15: the basket_brand_pairs 100x probe joins
lineitem's offset l_partkey against it, so the dim must replicate with
the same offsets — brands unchanged, each replica joins its own copy).

Replication discipline (same as make_docs_x10/make_events_x10): replica k
offsets every key column by k * (max+1), so the result is 10 DISJOINT
copies of the original relational structure — row counts grow 10x while
join fan-outs, per-key degrees and value distributions stay constant.
Concretely for the probes:
  - kcore_peel: customer/part node count x10, per-node purchase degrees
    unchanged — 10x the peel workload at the same cascade shape.
  - priority_sample: 10x weighted candidates, same top-k.
  - pq_codes/pq_search: 10x vectors with an identical value distribution —
    codebook training sees 10x rows, assignment scores 10x codes.

Usage: python3 tools/make_x10.py [src_dir] [out_dir]
"""
import os
import subprocess
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10_all"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

o_off = con.sql(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
c_off = con.sql(f"SELECT max(o_custkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
# the part dim's offset must clear BOTH key domains: a part row whose key
# exceeds the highest referenced l_partkey would otherwise collide across
# replicas (duplicate p_partkey -> silent join fan-out in the probes)
p_off = con.sql(f"""SELECT greatest(
    (SELECT max(l_partkey) FROM '{src}/lineitem.parquet'),
    (SELECT max(p_partkey) FROM '{src}/part.parquet')) + 1""").fetchone()[0]
s_off = con.sql(f"SELECT max(l_suppkey)+1 FROM '{src}/lineitem.parquet'").fetchone()[0]
v_off = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]

con.execute(f"""
  COPY (
    SELECT o_orderkey + k.k * {o_off} AS o_orderkey,
           o_custkey + k.k * {c_off} AS o_custkey,
           o.* EXCLUDE (o_orderkey, o_custkey)
    FROM '{src}/orders.parquet' o
    CROSS JOIN (SELECT unnest(range(10)) AS k) k
  ) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
  COPY (
    SELECT l_orderkey + k.k * {o_off} AS l_orderkey,
           l_partkey + k.k * {p_off} AS l_partkey,
           l_suppkey + k.k * {s_off} AS l_suppkey,
           l.* EXCLUDE (l_orderkey, l_partkey, l_suppkey)
    FROM '{src}/lineitem.parquet' l
    CROSS JOIN (SELECT unnest(range(10)) AS k) k
  ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
  COPY (
    SELECT p_partkey + k.k * {p_off} AS p_partkey,
           p.* EXCLUDE (p_partkey)
    FROM '{src}/part.parquet' p
    CROSS JOIN (SELECT unnest(range(10)) AS k) k
  ) TO '{out}/part.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
  COPY (
    SELECT vec_id + k.k * {v_off} AS vec_id,
           e.* EXCLUDE (vec_id)
    FROM '{src}/embeddings.parquet' e
    CROSS JOIN (SELECT unnest(range(10)) AS k) k
  ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
for t in ("orders", "lineitem", "part", "embeddings"):
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"wrote {out}/{t}.parquet rows={n}")

here = os.path.dirname(os.path.abspath(__file__))
subprocess.run([sys.executable, f"{here}/make_docs_x10.py", src, out], check=True)
subprocess.run([sys.executable, f"{here}/make_events_x10.py", src, out], check=True)

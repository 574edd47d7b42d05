#!/usr/bin/env python3
"""Density-preserving 10x replication of sf0.1 documents for the text-op
scale probes (round 8): replica k offsets doc_id by k * max — corpus size
grows 10x while per-doc length and the duplicate-text structure stay
constant (texts repeat verbatim across replicas, which only RAISES the
dedup families' bucket pressure — the conservative direction for a probe).

Usage: python3 tools/make_docs_x10.py [src_dir] [out_dir]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10_docs"

con = duckdb.connect()
con.execute(f"CREATE VIEW d AS SELECT * FROM '{src}/documents.parquet'")
off = con.sql("SELECT max(doc_id)+1 FROM d").fetchone()[0]

import os
os.makedirs(out, exist_ok=True)
con.execute(f"""
  COPY (
    SELECT d.doc_id + k.k * {off} AS doc_id, d.text, d.lang, d.source, d.n_chars
    FROM d CROSS JOIN (SELECT unnest(range(10)) AS k) k
  ) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
print(f"wrote {out}/documents.parquet rows={n} (10x of {src})")

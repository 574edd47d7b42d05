#!/usr/bin/env python3
"""Build a density-preserving 10x replication of sf0.1 for the event-time
operator family (VERDICT r7 next-round #6).

Replica k (k = 0..9) offsets event_id and user_id by k * max, and shifts
ts by k * (span + 1s). User count and the covered time range both grow
10x while per-user event density and per-time-band row density stay
constant — so sessionize/rolling/as-of (per-user shapes) AND the banded
range join (per-time-band shape) each see exactly 10x workload, not a
100x densified one.

Usage: python3 tools/make_events_x10.py [src_dir] [out_dir]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10_events"

con = duckdb.connect()
con.execute(f"CREATE VIEW e AS SELECT * FROM '{src}/events.parquet'")
eid_off, uid_off, lo, hi = con.sql(
    "SELECT max(event_id)+1, max(user_id)+1, min(ts), max(ts) FROM e").fetchone()
span_us = int((hi - lo).total_seconds() * 1_000_000) + 1_000_000

import os
os.makedirs(out, exist_ok=True)
con.execute(f"""
  COPY (
    SELECT e.event_id + k.k * {eid_off} AS event_id,
           e.ts + to_microseconds(k.k * {span_us}) AS ts,
           e.user_id + k.k * {uid_off} AS user_id,
           e.event_type, e.value, e.props
    FROM e CROSS JOIN (SELECT unnest(range(10)) AS k) k
  ) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
print(f"wrote {out}/events.parquet rows={n} (10x of {src})")

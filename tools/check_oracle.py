#!/usr/bin/env python3
"""Local replication of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables registered as views over <sfDir>/*.parquet), read the Spark result
parquet, sort columns by name, and compare row-by-row values. Reports
rowcount / schema / value mismatches. Rows are compared in result order.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return v  # exact compare; determinism is the engine's job
    if hasattr(v, "item"):
        v = v.item()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        actual = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        # driver semantics: sort columns by name, hash values in row order
        ecols, acols = sorted(expected.columns), sorted(actual.columns)
        if ecols != acols:
            print(f"FAIL {name}: schema mismatch spark={acols} oracle={ecols}")
            n_fail += 1
            continue
        expected, actual = expected[ecols], actual[acols]
        if len(expected) != len(actual):
            print(f"FAIL {name}: rowcount spark={len(actual)} oracle={len(expected)}")
            n_fail += 1
            continue
        bad = 0
        for col in ecols:
            ev, av = expected[col].tolist(), actual[col].tolist()
            for i, (e, a) in enumerate(zip(ev, av)):
                if norm_cell(e) != norm_cell(a):
                    if bad < 3:
                        print(f"  {name}.{col}[{i}]: spark={a!r} oracle={e!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} value mismatches ({len(expected)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expected)} rows)")
            n_pass += 1
    # rows-only queries (no oracle): just report counts
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"INFO {d}: rows-only, {n} rows")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

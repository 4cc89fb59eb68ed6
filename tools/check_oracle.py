#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the fixture tables, and compares: schema (column
names + kinds), row count, and exact values (columns sorted by name, rows
sorted by all columns). Exact equality required — if this passes, any
tolerance the real driver applies passes too.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            # filtered Verify run (local iteration) — not a failure
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            want = canon(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                mismatch = f"dtype[{c}] {a.dtype} != {b.dtype}"
                break
            if not a.equals(b):
                bad = (a != b) & ~(a.isna() & b.isna())
                i = bad[bad].index[0]
                mismatch = f"value[{c}] row {i}: {a[i]!r} != {b[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

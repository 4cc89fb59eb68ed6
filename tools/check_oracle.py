#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the fixture tables, and compares: schema (column
names + kinds), row count, and exact values (columns sorted by name, rows
sorted by all columns). Exact equality required — if this passes, any
tolerance the real driver applies passes too.

Usage: check_oracle.py <sfDir> <verifyOutDir> [queryName ...]

With query names given (mirroring a filtered `graft.Verify` run), only
those queries are checked. WITHOUT a filter, every oracle entry must
have a result dir: Verify catches per-query exceptions and writes no
parquet for a crashed query, so a silently-missing dir in a full run is
a FAILURE (a crashing query must never drop out of the gate).
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


def main(sf_dir, out_dir, only=()):
    import os
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            n_skip += 1
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            if only:
                # explicitly-requested query with no dump: that IS a failure
                print(f"FAIL {name}: requested but no result dir")
                n_fail += 1
            else:
                # full run: Verify only omits a dir when the query CRASHED
                # (it catches and logs to stderr) — never skip silently
                print(f"FAIL {name}: no result dir (query crashed in Verify?)")
                n_fail += 1
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
    skipped = f", {n_skip} skipped (filtered)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], frozenset(sys.argv[3:])))

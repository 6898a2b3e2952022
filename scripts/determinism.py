#!/usr/bin/env python3
"""Two-run determinism diff (VERDICT r11 #4; see docs/DETERMINISM.md).

Usage: python3 scripts/determinism.py <outDirA> <outDirB>

Compares every query's parquet output between two independent
`graft.Verify` runs (fresh JVM sessions — fresh DfCache, fresh /tmp
layouts) cell-exact, in produced order (every registered query has a
total ORDER BY). Any diff means a registered output depends on runtime
state (scan metrics, cache state, partitioning luck) rather than the
data — the q132 failure class the driver's oracle would catch later.

NOT part of the engine — Python/duckdb are driver-side tools only.
"""
import math
import os
import sys

import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names_a = {d for d in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, d))}
    names_b = {d for d in os.listdir(b_dir)
               if os.path.isdir(os.path.join(b_dir, d))}
    if names_a != names_b:
        print(f"FAIL query sets differ: only-A={sorted(names_a - names_b)}"
              f" only-B={sorted(names_b - names_a)}")
        sys.exit(1)
    con = duckdb.connect()
    n_pass = n_fail = 0
    for name in sorted(names_a):
        try:
            adf = con.sql(f"SELECT * FROM '{a_dir}/{name}/*.parquet'").df()
            bdf = con.sql(f"SELECT * FROM '{b_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: read error: {str(e)[:200]}")
            n_fail += 1
            continue
        adf = adf[sorted(adf.columns)]
        bdf = bdf[sorted(bdf.columns)]
        if list(adf.columns) != list(bdf.columns):
            print(f"FAIL {name}: columns A={list(adf.columns)} "
                  f"B={list(bdf.columns)}")
            n_fail += 1
            continue
        if len(adf) != len(bdf):
            print(f"FAIL {name}: rows A={len(adf)} B={len(bdf)}")
            n_fail += 1
            continue
        a = [[norm(v) for v in row] for row in adf.itertuples(index=False)]
        b = [[norm(v) for v in row] for row in bdf.itertuples(index=False)]
        if a != b:
            bad = next(i for i in range(len(a)) if a[i] != b[i])
            print(f"FAIL {name}: first diff row {bad}:\n  runA={a[bad]}\n"
                  f"  runB={b[bad]}")
            n_fail += 1
            continue
        n_pass += 1
    print(f"== determinism: {n_pass} identical, {n_fail} diverged ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each testdata parquet as a DuckDB view, runs each oracle, and compares it
cell-by-cell against the parquet the Spark side wrote. Columns are sorted
by name before compare (the driver does the same); rows are compared in
produced order since every query has a total ORDER BY.

NOT part of the engine — Python/duckdb are driver-side tools only.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # exact float compare (bit-level via repr): verified to hold for every
    # oracle query at sf0.01 — Spark round() and DuckDB round() agree
    # exactly on this data, so don't mask ulp regressions with formatting
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            sdf = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:200]}")
            n_fail += 1
            continue
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns oracle={list(odf.columns)} "
                  f"spark={list(sdf.columns)}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        o = [[norm(v) for v in row] for row in odf.itertuples(index=False)]
        s = [[norm(v) for v in row] for row in sdf.itertuples(index=False)]
        if o != s:
            bad = next(i for i in range(len(o)) if o[i] != s[i])
            print(f"FAIL {name}: first diff row {bad}:\n  oracle={o[bad]}\n"
                  f"  spark ={s[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(odf)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

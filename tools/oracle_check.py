#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads oracle_sql.json (written by graft.Verify), runs each SQL in DuckDB
against the sfDir parquet tables, and compares row-count / schema / values
(columns sorted by name, rows sorted, doubles compared bitwise) with the
Spark result parquet.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        ecols, gcols = sorted(exp.columns), sorted(got.columns)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={gcols}")
            failures += 1
            continue
        exp = exp[ecols].sort_values(ecols).reset_index(drop=True)
        got = got[gcols].sort_values(gcols).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows differ: oracle={len(exp)} spark={len(got)}")
            failures += 1
            continue
        mismatch = None
        for c in ecols:
            ev, gv = exp[c], got[c]
            if str(ev.dtype) != str(gv.dtype):
                mismatch = f"dtype[{c}]: oracle={ev.dtype} spark={gv.dtype}"
                break
            neq = ~((ev == gv) | (ev.isna() & gv.isna()))
            if neq.any():
                i = neq.idxmax()
                mismatch = f"value[{c}] row {i}: oracle={ev[i]!r} spark={gv[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            failures += 1
        else:
            print(f"PASS {name}: {len(exp)} rows")
    print(f"== {len(oracle) - failures}/{len(oracle)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

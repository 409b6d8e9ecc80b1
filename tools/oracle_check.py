#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--json <path>]

Reads oracle_sql.json (written by graft.Verify), runs each SQL in DuckDB
against the sfDir parquet tables, and compares row-count / schema / values
(columns sorted by name, rows sorted, doubles compared bitwise) with the
Spark result parquet. With --json, also writes a machine-readable
per-query report (the committed GATECHECK_r{N}.json artifact).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, json_path: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    report = {}

    def record(name, status, rows=None, why=None):
        report[name] = {"status": status}
        if rows is not None:
            report[name]["rows"] = int(rows)
        if why is not None:
            report[name]["why"] = why

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, "FAIL", why=f"oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            record(name, "FAIL", why=f"spark output unreadable: {e}")
            failures += 1
            continue
        ecols, gcols = sorted(exp.columns), sorted(got.columns)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={gcols}")
            record(name, "FAIL", why=f"columns differ: oracle={ecols} spark={gcols}")
            failures += 1
            continue
        exp = exp[ecols].sort_values(ecols).reset_index(drop=True)
        got = got[gcols].sort_values(gcols).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows differ: oracle={len(exp)} spark={len(got)}")
            record(name, "FAIL", why=f"rows differ: oracle={len(exp)} spark={len(got)}")
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
            record(name, "FAIL", rows=len(exp), why=mismatch)
            failures += 1
        else:
            print(f"PASS {name}: {len(exp)} rows")
            record(name, "PASS", rows=len(exp))
    print(f"== {len(oracle) - failures}/{len(oracle)} passed")
    if json_path:
        out = {"sf_dir": sf_dir, "n_queries": len(oracle),
               "n_pass": len(oracle) - failures,
               "compare": "DuckDB oracle vs Spark parquet: row count, dtypes, bitwise values (cols+rows sorted)",
               "queries": report}
        with open(json_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    jp = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json")
        jp = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], jp))

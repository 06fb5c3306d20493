#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: driver_gate_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs
every oracle text in DuckDB over the sf parquet views, loads the
engine's parquet result for the same name, and compares schema
(sorted column names) + the sorted stringified row multisets.
Prints PASS/FAIL per name and a summary; exit 1 on any FAIL.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(str(r[i]) for i in order) for r in cur.fetchall())
    return sorted(cols), rows


def main():
    sf, out = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
    ok, bad, skipped = 0, [], []
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            skipped.append(name)
            print(f"[gate] {name:26s} NO-ENGINE-OUTPUT")
            continue
        try:
            oc, orows = canon(con, oracle[name])
        except Exception as e:
            bad.append(name)
            print(f"[gate] {name:26s} ORACLE-ERROR: {str(e).splitlines()[0][:140]}")
            continue
        ec, erows = canon(
            con, f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')")
        if oc != ec:
            bad.append(name)
            print(f"[gate] {name:26s} SCHEMA: oracle={oc} engine={ec}")
        elif orows != erows:
            bad.append(name)
            d1 = [r for r in orows if r not in set(erows)][:2]
            d2 = [r for r in erows if r not in set(orows)][:2]
            print(f"[gate] {name:26s} ROWS: oracle={len(orows)} engine={len(erows)} "
                  f"onlyOracle={d1} onlyEngine={d2}")
        else:
            ok += 1
            print(f"[gate] {name:26s} PASS ({len(erows)} rows)")
    print(f"[gate] SUMMARY pass={ok} fail={len(bad)} no_output={len(skipped)}")
    if bad:
        print("[gate] FAILED:", ", ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()

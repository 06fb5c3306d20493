#!/usr/bin/env python3
"""Prove an oracle-text rewrite row-identical in DuckDB before landing.

Usage: oracle_rewrite_check.py <sfDir> <oldSqlFile> <newSqlFile>

Registers the same parquet views the driver's oracle run uses, executes
both texts, and compares the full sorted row multisets (column order
normalized by name, values stringified the way the driver's canon does).
Exit 0 = identical; prints a diff sample otherwise.
"""
import sys, duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in cur.fetchall():
        out.append(tuple(str(r[i]) for i in order))
    return [cols[i] for i in order], sorted(out)


def main():
    sf, old_f, new_f = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
    old_sql = open(old_f).read()
    new_sql = open(new_f).read()
    c1, r1 = rows(con, old_sql)
    c2, r2 = rows(con, new_sql)
    if c1 != c2:
        print(f"SCHEMA MISMATCH: old={c1} new={c2}")
        sys.exit(1)
    if r1 == r2:
        print(f"IDENTICAL: {len(r1)} rows, cols={c1}")
        sys.exit(0)
    print(f"ROW MISMATCH: old={len(r1)} new={len(r2)}")
    s1, s2 = set(r1), set(r2)
    for r in list(s1 - s2)[:5]:
        print("  only-old:", r)
    for r in list(s2 - s1)[:5]:
        print("  only-new:", r)
    sys.exit(1)


if __name__ == "__main__":
    main()

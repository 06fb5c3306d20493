#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and diff. Usage:
  python3 tools/check_correctness.py <verify_out_dir> <sf_dir>
Compares column-name-sorted, row-sorted values with exact match for
non-floats and 1e-9 relative tolerance for floats (the driver hashes;
we want to know we'd hash-match, so exact equality is reported too).
"""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

def load_result(dirpath):
    files = glob.glob(os.path.join(dirpath, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:  # apply() on an empty frame yields a DataFrame, not a Series
        return df.reset_index(drop=True)
    # stringify for stable sort across dtypes
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    # queries that THREW in Verify leave no output dir — flag them
    # instead of silently skipping (queries.json is the full inventory)
    qlist_path = os.path.join(out_dir, "queries.json")
    if os.path.exists(qlist_path):
        expected = set(json.load(open(qlist_path)))
        present = {n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n))}
        for missing in sorted(expected - present):
            print(f"FAIL {missing}: query threw in Verify (no output dir)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = load_result(d)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"ROWS {name}: rows={len(got)} (no oracle)" )
            if len(got) == 0: print(f"  WARN {name}: zero rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
                gv2 = gv.astype(float).to_numpy(); ev2 = ev.astype(float).to_numpy()
                both_nan = np.isnan(gv2) & np.isnan(ev2)
                close = np.isclose(gv2, ev2, rtol=1e-9, atol=1e-12) | both_nan
                exact = ((gv2 == ev2) | both_nan).all()
                if not close.all():
                    bad = np.where(~close)[0][:3]
                    print(f"FAIL {name}.{c}: e.g. {gv2[bad]} vs {ev2[bad]}")
                    ok = False
                elif not exact:
                    print(f"  WARN {name}.{c}: float not bit-exact (within tol)")
            else:
                if not (gv.astype(str).to_numpy() == ev.astype(str).to_numpy()).all():
                    mism = np.where(gv.astype(str).to_numpy() != ev.astype(str).to_numpy())[0][:3]
                    for i in mism:
                        print(f"FAIL {name}.{c}: row{i} {gv.iloc[i]!r} vs {ev.iloc[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Row-identity diff of two graft.Verify output dirs (e.g. the
memory-pressure rehearsal: a constrained-heap pass vs the calm pass).
Usage: python3 tools/compare_dumps.py <dir_a> <dir_b>
Exits non-zero on any query whose canonical rows differ or that is
present in one dir only."""
import sys, os, glob
import pandas as pd

def canon(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return (0, "")
    rows = sorted(df.astype(str).apply(lambda r: "\x00".join(r), axis=1))
    import hashlib
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")  # row separator: distinct sets must hash distinct
    return (len(rows), h.hexdigest())

def main():
    a, b = sys.argv[1], sys.argv[2]
    qa = {n for n in os.listdir(a) if os.path.isdir(os.path.join(a, n))}
    qb = {n for n in os.listdir(b) if os.path.isdir(os.path.join(b, n))}
    fails = 0
    for missing in sorted(qa ^ qb):
        print(f"FAIL {missing}: present in only one dump")
        fails += 1
    for name in sorted(qa & qb):
        ca, cb = canon(os.path.join(a, name)), canon(os.path.join(b, name))
        ok = ca == cb and ca is not None
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: {ca} vs {cb}"
              if not ok else f"PASS {name} ({ca[0]} rows)")
    print(f"\n{len(qa & qb) - fails} identical, {fails} mismatched")
    sys.exit(1 if fails else 0)

main()

#!/usr/bin/env python3
"""Determinism audit: compare two independent graft.Verify output dirs.

The driver's correctness gate hash-compares a FRESH Verify run against
DuckDB — any query whose output depends on partitioning, timing, or
iteration order fails there first. Run Verify twice (separate JVMs) and
diff every query's normalized rows:

  python3 tools/determinism_check.py /tmp/verify_a /tmp/verify_b
"""
import sys, glob, os, math

import pandas as pd


def key(df):
    cols = sorted(df.columns)
    out = []
    for r in df[cols].itertuples(index=False, name=None):
        row = []
        for v in r:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(round(v, 6))
            else:
                row.append(str(v))
        out.append(tuple(row))
    return out


def main(d1, d2):
    bad, n = [], 0
    for name in sorted(os.listdir(d1)):
        p1, p2 = os.path.join(d1, name), os.path.join(d2, name)
        if not os.path.isdir(p1):
            continue
        n += 1
        try:
            a = pd.concat([pd.read_parquet(f)
                           for f in sorted(glob.glob(p1 + "/*.parquet"))])
            b = pd.concat([pd.read_parquet(f)
                           for f in sorted(glob.glob(p2 + "/*.parquet"))])
            if key(a.reset_index(drop=True)) != key(b.reset_index(drop=True)):
                bad.append(name)
        except Exception as e:
            bad.append(f"{name} (ERROR {e})")
    print(f"checked {n} queries; nondeterministic: {bad if bad else 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

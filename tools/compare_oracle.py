#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads <out_dir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB over the same parquet fixtures, and compares against the Spark result
parquet at <out_dir>/<name>/. Comparison: column names (sorted), row count,
and cell values with columns sorted by name — floats rounded to 6 places.

Usage: python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, math, glob, os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    # decimals, dates, timestamps, numpy scalars -> canonical str
    return str(v)


def frame_key(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            failures.append((name, "NO SPARK OUTPUT"))
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            n_fail += 1
            continue
        s_cols, s_rows = frame_key(spark_df)
        d_cols, d_rows = frame_key(duck_df)
        if s_cols != d_cols:
            failures.append((name, f"COLS spark={s_cols} duck={d_cols}"))
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            failures.append((name, f"ROWS spark={len(s_rows)} duck={len(d_rows)}"))
            n_fail += 1
        elif s_rows != d_rows:
            # find first diff (ordered compare; queries are fully ordered)
            diff = next((i for i, (a, b) in enumerate(zip(s_rows, d_rows))
                         if a != b), None)
            failures.append(
                (name, f"VALUES first diff row {diff}: "
                       f"spark={s_rows[diff]} duck={d_rows[diff]}"))
            n_fail += 1
        else:
            n_pass += 1
    # queries without oracle: rows-only check
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p) or name in oracle:
            continue
        files = glob.glob(os.path.join(p, "*.parquet"))
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        status = "rows-only OK" if n > 0 else "rows-only EMPTY"
        print(f"  [no-oracle] {name}: {n} rows ({status})")
    print(f"\nPASS {n_pass} / FAIL {n_fail}")
    for name, why in failures:
        print(f"  FAIL {name}: {why[:500]}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

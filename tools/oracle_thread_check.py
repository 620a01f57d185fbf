#!/usr/bin/env python3
"""Oracle-side float-order audit (VERDICT r7 #6).

The Spark-side two-JVM determinism audit shares its arithmetic with
itself, so it cannot see ORACLE-side instability: a DuckDB build that
parallel-sums in a different order can tip a rounded 6dp value on a
different side of a .5e-6 boundary. This tool runs every oracle SQL from
a graft.Verify dump under PRAGMA threads=1 and threads=8 (plus a
threads=8 re-run) and compares the results two ways:

  - strict: raw repr of every cell (floats bit-for-bit) — differences
    here mean the oracle's float accumulation is order-sensitive;
  - gate-grade: the driver's own 6dp-rounded compare — differences here
    would actually flip CORRECTNESS_r{N}.json.

Usage: python3 tools/oracle_thread_check.py /root/testdata/sf0.01 /tmp/verify_out [report.md]
Exit 0 = no gate-grade differences; 1 otherwise.
"""
import sys, json, math, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir, threads):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def keys(df, rounded):
    cols = sorted(df.columns)

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            return round(v, 6) if rounded else repr(v)
        return str(v)

    rows = [tuple(cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    # Compare as a sorted multiset, not positionally: an oracle whose
    # ORDER BY leaves ties can legitimately reorder tied rows between
    # thread counts (parallel hash-agg emission order), and the driver's
    # own compare hashes sorted rows — only genuine cell-value
    # differences should fail this gate. None sorts before any value.
    return sorted(rows, key=lambda r: tuple((v is not None, str(v)) for v in r))


def main(sf_dir, out_dir, report_path):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con1 = connect(sf_dir, 1)
    con8 = connect(sf_dir, 8)
    strict_diff, gate_diff, rerun_diff, errors = [], [], [], []
    for name in sorted(oracle):
        try:
            d1 = con1.execute(oracle[name]).df()
            d8 = con8.execute(oracle[name]).df()
            d8b = con8.execute(oracle[name]).df()
        except Exception as e:
            errors.append((name, str(e)[:200]))
            continue
        if keys(d8, False) != keys(d8b, False):
            rerun_diff.append(name)  # nondeterministic at FIXED threads
        if keys(d1, False) != keys(d8, False):
            strict_diff.append(name)
        if keys(d1, True) != keys(d8, True):
            gate_diff.append(name)
    lines = [
        f"# Oracle thread-count cross-check @ {sf_dir}",
        "",
        f"Oracles run: {len(oracle) - len(errors)} "
        f"(errors: {len(errors)}); threads 1 vs 8 plus an 8-thread re-run.",
        "",
        f"- gate-grade (6dp-rounded) differences: **{len(gate_diff)}** "
        f"{gate_diff}",
        f"- strict bit-level differences (order-sensitive float sums, "
        f"below the gate's rounding): {len(strict_diff)} {strict_diff}",
        f"- same-thread re-run differences: {len(rerun_diff)} {rerun_diff}",
        "",
    ]
    if errors:
        lines.append("Errors:")
        lines += [f"- {n}: {e}" for n, e in errors]
    report = "\n".join(lines) + "\n"
    print(report)
    if report_path:
        with open(report_path, "w") as f:
            f.write(report)
    return 1 if gate_diff or errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

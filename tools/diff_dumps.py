#!/usr/bin/env python3
"""Diff two graft.Verify output dirs query-by-query (run-determinism
audit): for each query present in both, canonicalize (sort columns by
name, sort rows by all columns, render floats at full repr) and compare.
Exit nonzero on any differing query.

Usage: diff_dumps.py <dumpA> <dumpB>
"""
import sys, os, glob
import duckdb


def table_files(d, q):
    p = os.path.join(d, q)
    if os.path.isdir(p):
        return sorted(glob.glob(os.path.join(p, "*.parquet")))
    return []


def canon(con, files):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
    order = ", ".join(f'"{c}"' for c in sorted(cols))
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    return con.execute(
        f"SELECT {sel} FROM read_parquet({files!r}) ORDER BY {order}"
    ).fetchall()


def main():
    a, b = sys.argv[1], sys.argv[2]
    qs = sorted(set(os.listdir(a)) & set(os.listdir(b)) - {"oracle_sql.json"})
    con = duckdb.connect()
    bad = []
    for q in qs:
        fa, fb = table_files(a, q), table_files(b, q)
        if not fa or not fb:
            print(f"SKIP   {q} (missing parquet)")
            continue
        ra, rb = canon(con, fa), canon(con, fb)
        if ra == rb:
            print(f"SAME   {q} ({len(ra)} rows)")
        else:
            bad.append(q)
            print(f"DIFF   {q}: {len(ra)} vs {len(rb)} rows")
            for i, (x, y) in enumerate(zip(ra, rb)):
                if x != y:
                    print(f"  first diff row {i}:\n    A={x}\n    B={y}")
                    break
    print(f"\n{len(qs) - len(bad)} same, {len(bad)} diff")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

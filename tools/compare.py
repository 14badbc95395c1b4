#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: run each
oracle SQL in DuckDB over the sf tables, load the Spark result parquet,
canonicalize (columns sorted by name, doubles rounded to 9, rows sorted),
and diff. Usage: compare.py <sfDir> <verifyOutDir> [query ...]"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            import decimal
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 9)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # spill to a dedicated tmp dir (default is cwd-relative ".tmp" --
    # a big window sort once filled the repo disk mid-gate)
    con.execute("SET temp_directory='/tmp/graft_duck_tmp'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name} (no spark output)"); n_bad += 1; continue
        try:
            orel = con.sql(sql)
            ocols = list(orel.columns)
            otypes = dict(zip(ocols, [str(t) for t in orel.types]))
            orows = orel.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        try:
            srel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols = list(srel.columns)
            stypes = dict(zip(scols, [str(t) for t in srel.types]))
            srows = srel.fetchall()
        except Exception as e:
            print(f"SPARK-ERR {name}: {e}"); n_bad += 1; continue
        oc, orows = canon(orows, ocols)
        sc, srows = canon(srows, scols)
        if oc != sc:
            print(f"SCHEMA   {name}: oracle={oc} spark={sc}"); n_bad += 1; continue
        # dtype parity: the driver's hasher is dtype-sensitive (HUGEINT vs
        # BIGINT shipped twice as value-equal hash-fails) — flag any column
        # whose DuckDB type differs between oracle result and Spark parquet
        tbad = [(c, otypes[c], stypes[c]) for c in oc if otypes[c] != stypes[c]]
        if tbad:
            print(f"DTYPE    {name}: " + "; ".join(
                f"{c}: oracle={a} spark={b}" for c, a, b in tbad))
            n_bad += 1; continue
        if len(orows) != len(srows):
            print(f"ROWCOUNT {name}: oracle={len(orows)} spark={len(srows)}"); n_bad += 1; continue
        bad = [(a, b) for a, b in zip(orows, srows) if a != b]
        if bad:
            print(f"VALUES   {name}: {len(bad)}/{len(orows)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}")
            n_bad += 1; continue
        print(f"OK       {name} ({len(orows)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

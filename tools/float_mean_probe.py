#!/usr/bin/env python3
"""DuckDB binder type probe for the float-mean audit.

Consumes FLOATMEANS_RAW.json (written by `runMain graft.FloatMeanAudit`:
every avg(/sum( argument in every oracle SQL, with char offsets), asks
the DuckDB BINDER for each argument's type, and writes the content-keyed
verdicts to tools/float_mean_types.json.

The probe: rewrite the aggregate argument to `(arg) & 0` and EXPLAIN.
Bitwise AND only binds for integer types, so
  - the rewritten query binds            -> argument is integer-typed
  - binder error "No function matches .. &(T, INTEGER_LITERAL)" -> T is
    the argument's type (DOUBLE, DECIMAL(…), …)
  - any other failure -> UNKNOWN:<msg> (conservatively treated as float
    by the Scala-side gate; inspect manually)

Integer and DECIMAL sums are exact in any merge order, so only DOUBLE/
FLOAT verdicts represent the order-dependent-mean risk class.

Usage: python3 tools/float_mean_probe.py [sfDir]   (default sf0.001)
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raw = json.load(open("FLOATMEANS_RAW.json"))
    sqls, aggs = raw["sql"], raw["aggs"]
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/graft_duck_tmp'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    # probe innermost-first within each query so offsets stay valid for a
    # single-aggregate rewrite (each probe rewrites ONE occurrence of the
    # ORIGINAL sql)
    verdicts = {}
    counts = {"int": 0, "float": 0, "unknown": 0, "skipped_quantized": 0}
    for a in aggs:
        if a["quantized"]:
            counts["skipped_quantized"] += 1
            continue
        if a["key"] in verdicts:
            continue
        sql = sqls[a["query"]]
        arg = sql[a["start"]:a["end"]]
        probe = sql[:a["start"]] + "(" + arg + ") & 0" + sql[a["end"]:]
        try:
            con.execute("EXPLAIN " + probe)
            t = "INTEGER-BOUND"
            counts["int"] += 1
        except Exception as e:  # noqa: BLE001 - verdict from the message
            msg = str(e).replace("\n", " ")
            m = re.search(r"&\((\w+(?:\([^)]*\))?),", msg)
            if m:
                t = m.group(1)
                if "INT" in t.upper() or t.upper().startswith("DECIMAL"):
                    counts["int"] += 1
                elif t.upper() in ("DOUBLE", "FLOAT", "REAL"):
                    counts["float"] += 1
                else:
                    counts["unknown"] += 1
            else:
                t = "UNKNOWN:" + msg[:160]
                counts["unknown"] += 1
        verdicts[a["key"]] = t

    with open("tools/float_mean_types.json", "w") as f:
        json.dump(dict(sorted(verdicts.items())), f, indent=0)
    print(f"probed {len(verdicts)} distinct aggregate args over {sf}: "
          f"{counts}")
    floats = sorted({(a['query'], verdicts[a['key']]) for a in aggs
                     if not a["quantized"]
                     and verdicts.get(a["key"], "").upper()
                     in ("DOUBLE", "FLOAT", "REAL")})
    print(f"float-typed aggregates in {len({q for q, _ in floats})} queries:")
    for q, t in floats:
        print(f"  {q}: {t}")
    unknowns = sorted({(a['query'], verdicts[a['key']]) for a in aggs
                       if not a["quantized"]
                       and verdicts.get(a["key"], "").startswith("UNKNOWN")})
    if unknowns:
        print(f"UNKNOWN verdicts ({len(unknowns)}):")
        for q, t in unknowns:
            print(f"  {q}: {t}")


if __name__ == "__main__":
    main()

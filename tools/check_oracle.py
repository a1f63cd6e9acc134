#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB over the same test tables, sort columns by
name, and compare row-by-row. Reports schema and value mismatches.
"""
import sys, json, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    rowcheck = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        got = got[sorted(got.columns)]
        if name not in oracle:
            rowcheck.append((name, len(got)))
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if got.dtypes.tolist() != exp.dtypes.tolist():
            print(f"WARN {name}: dtypes {got.dtypes.tolist()} != {exp.dtypes.tolist()}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # row-order-sensitive compare (both sides are ORDER BY'd)
        neq = (got.astype(str).values != exp.astype(str).values)
        if neq.any():
            import numpy as np
            bad = np.argwhere(neq)[:5]
            print(f"FAIL {name}: {neq.sum()} cell mismatches, first at {bad.tolist()}")
            for r, c in bad.tolist()[:3]:
                cn = got.columns[c]
                print(f"   row {r} col {cn}: got={got.iloc[r, c]!r} exp={exp.iloc[r, c]!r}")
            n_fail += 1
            continue
        n_pass += 1
        print(f"PASS {name} ({len(got)} rows)")
    for name, n in rowcheck:
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only: {n} rows)")
        if n == 0:
            n_fail += 1
        else:
            n_pass += 1
    declared = set(oracle)
    qj = os.path.join(out_dir, "queries.json")
    if os.path.exists(qj):
        declared |= set(json.load(open(qj)))
    missing = declared - {d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))}
    for m in missing:
        print(f"FAIL {m}: no Spark result written")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

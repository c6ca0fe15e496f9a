#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet dir (Spark output) and runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with views over the
sfDir tables. Compares: column names (sorted), row counts, and exact
values after sorting rows. Reports per-query PASS/FAIL with sample diffs.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    # normalize for comparison: floats rounded to 9 sig decimals repr
    if isinstance(v, float):
        return repr(v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    fails = []
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT FILES"); n_fail += 1; fails.append(name); continue
        got = con.execute(f"SELECT * FROM parquet_scan({files!r})").fetchdf()
        if name not in oracle:
            print(f"{name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; fails.append(name); continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"{name}: COLUMN MISMATCH spark={gcols} duck={ecols}")
            n_fail += 1; fails.append(name); continue
        if len(got) != len(exp):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(got)} duck={len(exp)}")
            n_fail += 1; fails.append(name); continue
        g = got[gcols].sort_values(by=gcols, kind="mergesort").reset_index(drop=True)
        e = exp[ecols].sort_values(by=ecols, kind="mergesort").reset_index(drop=True)
        gv = [tuple(norm_cell(v) for v in row) for row in g.itertuples(index=False)]
        ev = [tuple(norm_cell(v) for v in row) for row in e.itertuples(index=False)]
        if gv == ev:
            print(f"{name}: PASS ({len(got)} rows)"); n_pass += 1
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b][:3]
            print(f"{name}: VALUE MISMATCH ({len([1 for a,b in zip(gv,ev) if a!=b])} rows differ)")
            for i, a, b in bad:
                print(f"   row {i}: spark={a}")
                print(f"   row {i}:  duck={b}")
            n_fail += 1; fails.append(name)
    print(f"\n== {n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

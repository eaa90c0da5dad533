#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB (tables registered as
views over <sfDir>/*.parquet), sorts columns by name, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value representation: round-trip through strings like a hash would
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # an oracle entry whose query produced no output dir is a failure
    # (Verify swallowed an exception for it)
    for name in sorted(oracle):
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: oracle present but no query output (query threw?)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            continue
        files = sorted(glob.glob(f"{res_dir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        # Verify coalesces to 1 file, but never silently compare a fragment
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name}: rows-only check ({len(got)} rows)")
            n_pass += ok; n_fail += (not ok); continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1; continue
        if list(g.dtypes) != list(w.dtypes):
            print(f"WARN {name}: dtypes {dict(g.dtypes)} vs {dict(w.dtypes)}")
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(
                g.reset_index(drop=True), w.reset_index(drop=True),
                check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:400]}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Oracle SQL smoke rail: execute EVERY SparkEntry.oracleSql entry in DuckDB
against the sf0.001 fixtures and fail on any parse/bind/runtime error.

This is the SQL analog of RegistrySurveySpec: it does NOT compare values
(scripts/oracle_check.py does that against Verify output); it guarantees an
oracle that was never executed cannot ship (the r14 BPE binder-error class).

Usage:
  python3 scripts/oracle_smoke.py <sfDir> <oracle_sql.json>
  # dump the JSON without running any query first:
  #   sbt 'runMain graft.Verify /root/testdata/sf0.001 /tmp/smoke __none__'

Exit 0 = every oracle executed; 1 = at least one errored (errors printed).
Also fails if the JSON is empty or unreadable. Self-test:
  python3 scripts/oracle_smoke.py --selftest
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main(sf_dir, oracle_path):
    oracle = json.load(open(oracle_path))
    if not oracle:
        print("FAIL: oracle_sql.json is empty")
        return 1
    con = connect(sf_dir)
    n_err = 0
    t0 = time.time()
    for name in sorted(oracle):
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            n_err += 1
            print(f"ERR  {name}: {str(e).splitlines()[0][:300]}")
    print(f"{len(oracle) - n_err}/{len(oracle)} oracles executed clean "
          f"({time.time() - t0:.1f}s)")
    return 1 if n_err else 0


def selftest():
    """The rail must catch a deliberately broken oracle."""
    import tempfile
    sf = os.environ.get("SMOKE_SF_DIR", "/root/testdata/sf0.001")
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump({"ok": "SELECT 1 AS x",
                   "broken_bitwise": "SELECT 'a' | 'b' AS x",
                   "broken_parse": "SELEC 1"}, f)
        path = f.name
    rc = main(sf, path)
    os.unlink(path)
    if rc != 1:
        print("SELFTEST FAIL: broken oracles not caught")
        return 1
    print("SELFTEST PASS: broken oracles caught")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))

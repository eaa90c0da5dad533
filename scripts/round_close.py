#!/usr/bin/env python3
"""Round-close rail: prove the round's recorded artifacts match the shipped
registry before the driver snapshots.

Checks (each prints PASS/FAIL; exit 1 on any FAIL):
  1. The latest benchruns/*.json has n_queries == len(registry.json),
     failures == 0 — a bench record can never silently predate a
     late-registered operator again (the r14 246-vs-257 gap).
  2. B1/B2 vs the ratified BASELINE.md budget: per-query median <= 3.42 s,
     total <= n x 3.42 s.
  3. Every oracleSql executes in DuckDB at sf0.001 (delegates to
     scripts/oracle_smoke.py, including its selftest).

Usage:
  python3 scripts/round_close.py <verifyOutDir>
where <verifyOutDir> holds registry.json + oracle_sql.json from
  sbt 'runMain graft.Verify /root/testdata/sf0.001 <verifyOutDir> __none__'
"""
import sys, json, glob, os, subprocess

B1_MEDIAN_BUDGET = 3.42  # sec/query, BASELINE.md "Bench budget" (ratified r14)


def latest_bench():
    runs = sorted(glob.glob("benchruns/*.json"), key=os.path.getmtime)
    return runs[-1] if runs else None


def main(verify_dir):
    fails = 0
    registry = json.load(open(f"{verify_dir}/registry.json"))
    bench_path = latest_bench()
    if bench_path is None:
        print("FAIL bench: no benchruns/*.json recorded")
        fails += 1
    else:
        b = json.load(open(bench_path))
        n, nf = b.get("n_queries"), b.get("failures")
        if n != len(registry):
            print(f"FAIL bench-coverage: {bench_path} has n_queries={n} "
                  f"but registry has {len(registry)} keys")
            fails += 1
        else:
            print(f"PASS bench-coverage: {bench_path} covers all "
                  f"{len(registry)} registry keys")
        if nf != 0:
            print(f"FAIL bench-failures: {bench_path} records {nf} failures")
            fails += 1
        else:
            print("PASS bench-failures: 0")
        med, total = b.get("median_sec"), b.get("value")
        b2 = len(registry) * B1_MEDIAN_BUDGET
        ok1, ok2 = med <= B1_MEDIAN_BUDGET, total <= b2
        print(f"{'PASS' if ok1 else 'FAIL'} B1: median {med:.3f}s <= "
              f"{B1_MEDIAN_BUDGET}s" if ok1 else
              f"FAIL B1: median {med:.3f}s > {B1_MEDIAN_BUDGET}s")
        print(f"{'PASS' if ok2 else 'FAIL'} B2: total {total:.1f}s "
              f"{'<=' if ok2 else '>'} {b2:.0f}s")
        fails += (not ok1) + (not ok2)
    for cmd in (["python3", "scripts/oracle_smoke.py", "--selftest"],
                ["python3", "scripts/oracle_smoke.py", "/root/testdata/sf0.001",
                 f"{verify_dir}/oracle_sql.json"]):
        r = subprocess.run(cmd, capture_output=True, text=True)
        tail = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
        print(f"{'PASS' if r.returncode == 0 else 'FAIL'} {' '.join(cmd[1:])}: {tail}")
        if r.stderr and r.returncode != 0:
            print("  " + r.stderr.strip().splitlines()[-1])
        fails += r.returncode != 0
    print(f"\nround-close: {'CLEAN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

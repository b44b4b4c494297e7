#!/usr/bin/env python
"""One-command round gate battery (VERDICT r5 #8): reproduce every
locally-committed per-round artifact and fail on any drift.

    python tools/verify_round.py [--round N] [--fast]

Steps (in order; the first failure stops the run):

1. full-registry correctness  -> CORRECTNESS_full_r{N}.json
   (tools/check_correctness.py --exact, all entries)
1b. driver-window pre-flight (tools/audit_driver_window.py): the 50
   entries the driver will hash next round replay through the
   bit-exact check PLUS the pandas-bridge dtype-symmetry check, so
   "window lands green" is a pre-commit gate, not a post-hoc
   discovery (VERDICT r7 #8)
2. pytest tests/ -x -q
3. doc sync: OPERATORS.md regenerated from the registry must match the
   committed file; COVERAGE.md totals must match the registry
   (tools/update_coverage_header.py --check) — the drift class found
   in r5 (stale hand-typed header)
4. leak/copy tripwires: the package must not import the reference's
   stack (boto3/psycopg2/airflow DAG APIs) or contain credential-like
   markers
5. headline bench (bench.py, sf0.1) -> BENCH_local_r{N}.json, then
   the floor/2x gate (tools/check_floors.py vs tools/floors.json —
   VERDICT r8 #3)                           [skipped with --fast]
6. sf1 scale bench -> BENCH_scale_r{N}.json [skipped with --fast]

Benches run LAST so their numbers are never polluted by the battery's
own load.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark"

# Patterns that would indicate copied reference plumbing (the reference
# is boto3/psycopg2/pandas-over-Airflow) or leaked credentials.  The
# package NAME contains "airflow", so match import forms, not the word.
LEAK_PATTERNS = [
    r"^\s*import boto3", r"^\s*from boto3", r"^\s*import psycopg2",
    r"^\s*from psycopg2", r"^\s*from airflow", r"^\s*import airflow",
    r"AKIA[0-9A-Z]{16}", r"aws_secret_access_key\s*=",
]


def run(step: str, cmd: list[str]) -> None:
    print(f"\n=== {step}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=ROOT)
    if r.returncode != 0:
        print(f"verify_round: FAILED at step '{step}'", file=sys.stderr)
        sys.exit(r.returncode)


def infer_round() -> int:
    rounds = [int(m.group(1)) for f in os.listdir(ROOT)
              if (m := re.match(r"CORRECTNESS_r(\d+)\.json", f))]
    return (max(rounds) + 1) if rounds else 1


def leak_scan() -> None:
    print("\n=== leak/copy tripwires", flush=True)
    pats = [re.compile(p) for p in LEAK_PATTERNS]
    hits = []
    scan_dirs = [os.path.join(ROOT, PKG), os.path.join(ROOT, "tools"),
                 os.path.join(ROOT, "tests")]
    scan_files = [os.path.join(ROOT, "bench.py"),
                  os.path.join(ROOT, "__spark_entry__.py")]
    for d in scan_dirs:
        for dirpath, _, files in os.walk(d):
            scan_files += [os.path.join(dirpath, f)
                           for f in files if f.endswith(".py")]
    for path in scan_files:
        for i, line in enumerate(open(path), 1):
            for p in pats:
                if p.search(line):
                    hits.append(f"{path}:{i}: {line.strip()}")
    if hits:
        print("\n".join(hits), file=sys.stderr)
        print("verify_round: FAILED leak/copy tripwires", file=sys.stderr)
        sys.exit(1)
    print("clean")


def doc_sync() -> None:
    run("coverage header sync",
        [sys.executable, "tools/update_coverage_header.py", "--check"])
    print("\n=== OPERATORS.md sync", flush=True)
    gen = subprocess.run(
        [sys.executable, "tools/gen_operator_docs.py"],
        cwd=ROOT, capture_output=True, text=True, check=True).stdout
    committed = open(os.path.join(ROOT, "OPERATORS.md")).read()
    if gen != committed:
        print("OPERATORS.md drifted from the registry — regenerate with "
              "`python tools/gen_operator_docs.py > OPERATORS.md`",
              file=sys.stderr)
        sys.exit(1)
    print("in sync")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--fast", action="store_true",
                    help="skip the two bench steps")
    args = ap.parse_args()
    rnd = args.round if args.round is not None else infer_round()
    print(f"verify_round: round {rnd}")

    run("full-registry correctness",
        [sys.executable, "tools/check_correctness.py", "--exact",
         "--json", f"CORRECTNESS_full_r{rnd:02d}.json"])
    run("driver-window pre-flight",
        [sys.executable, "tools/audit_driver_window.py"])
    run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    doc_sync()
    leak_scan()
    if not args.fast:
        # headline bench, then the floor/2x gate over its record
        # (VERDICT r8 #3: the gate is machine-enforced here, reading
        # tools/floors.json — min > 2x floor fails outright; a
        # steal-flat median > 2x floor fails; an elevated-steal median
        # over the line with a passing min prints PENDING and requires
        # a steal-flat follow-up before round close)
        print("\n=== headline bench (sf0.1): bench.py", flush=True)
        r = subprocess.run([sys.executable, "bench.py"],
                           cwd=ROOT, capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            print("verify_round: FAILED at step 'headline bench'",
                  file=sys.stderr)
            sys.exit(r.returncode)
        bench_line = [ln for ln in r.stdout.strip().splitlines()
                      if ln.startswith("{")][-1]
        print(bench_line)
        bench_path = os.path.join(ROOT, f"BENCH_local_r{rnd:02d}.json")
        with open(bench_path, "w") as f:
            f.write(bench_line + "\n")
        run("floor/2x gate",
            [sys.executable, "tools/check_floors.py", bench_path])
        print("\n=== sf1 scale bench -> "
              f"BENCH_scale_r{rnd:02d}.json", flush=True)
        r = subprocess.run([sys.executable, "tools/bench_scale.py"],
                           cwd=ROOT, capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            print("verify_round: FAILED at step 'sf1 scale bench'",
                  file=sys.stderr)
            sys.exit(r.returncode)
        line = r.stdout.strip().splitlines()[-1]
        print(line)
        with open(os.path.join(ROOT, f"BENCH_scale_r{rnd:02d}.json"),
                  "w") as f:
            f.write(line + "\n")
    print(f"\nverify_round: round {rnd} ALL GATES GREEN")


if __name__ == "__main__":
    main()

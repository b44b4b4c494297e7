#!/usr/bin/env python
"""One-session interleaved A/B of two REPO TREES' bench.py (VERDICT
r10 #6): the r10 headline total moved +4.7 % over r9 at equal steal,
broad and uniform across the smallest queries while join-heavy queries
improved — the signature of ambient conditions, but the round gate
needs it settled ambient-vs-code.  Cross-session absolutes are
untrustworthy on this host (BASELINE.md r7/r9 stall sections), so this
script alternates FULL bench.py passes of two git worktrees inside one
time window: pass order A B A B ... with a fresh JVM per pass (both
trees pay identical per-pass session overhead; slow ambient drift
cancels by interleaving).

Per-query medians/mins are compared tree-vs-tree over the common query
set.  If the r10 tree reads slower than r9 IN THE SAME WINDOW, the r10
registry additions are implicated (bisect next); if they read equal,
the r10 artifact drift was ambient.

Usage::

    python tools/diag_ab_trees.py --a .ab/r9 --b .ab/r10
        [--passes 4] [--runs-per-pass 3] [--out DIAG_ab_r9_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys


def run_pass(tree: str, runs: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
               PYTHONPATH=tree)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree, env=env, capture_output=True, text=True, check=True)
    # bench.py prints ONE JSON line on stdout (logs go to stderr)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="tree A (e.g. .ab/r9)")
    ap.add_argument("--b", required=True, help="tree B (e.g. .ab/r10)")
    ap.add_argument("--passes", type=int, default=4,
                    help="passes PER TREE, interleaved A B A B ...")
    ap.add_argument("--runs-per-pass", type=int, default=3)
    ap.add_argument("--out", default="DIAG_ab_trees.json")
    args = ap.parse_args()

    a = os.path.abspath(args.a)
    b = os.path.abspath(args.b)
    passes: dict[str, list[dict]] = {"a": [], "b": []}
    for i in range(args.passes):
        for label, tree in (("a", a), ("b", b)):
            res = run_pass(tree, args.runs_per_pass)
            passes[label].append(res)
            print(f"pass {i + 1} {label} ({os.path.basename(tree)}): "
                  f"total {res['value']}s steal {res.get('steal_pct')}%",
                  file=sys.stderr)

    common = set(passes["a"][0]["queries"])
    for side in ("a", "b"):
        for p in passes[side]:
            common &= set(p["queries"])
    summary = {}
    for q in sorted(common):
        sa = [p["queries"][q] for p in passes["a"]]
        sb = [p["queries"][q] for p in passes["b"]]
        summary[q] = {
            "a_median": round(statistics.median(sa), 3),
            "b_median": round(statistics.median(sb), 3),
            "a_min": round(min(sa), 3),
            "b_min": round(min(sb), 3),
            "b_over_a_median": round(statistics.median(sb)
                                     / statistics.median(sa), 3),
            "b_over_a_min": round(min(sb) / min(sa), 3),
        }
    tot_a = [sum(p["queries"][q] for q in common) for p in passes["a"]]
    tot_b = [sum(p["queries"][q] for q in common) for p in passes["b"]]
    out = {
        "tree_a": a, "tree_b": b,
        "passes_per_tree": args.passes,
        "runs_per_pass": args.runs_per_pass,
        "steal_pct_per_pass": {
            s: [p.get("steal_pct") for p in passes[s]] for s in ("a", "b")},
        "common_total_median": {
            "a": round(statistics.median(tot_a), 3),
            "b": round(statistics.median(tot_b), 3),
            "b_over_a": round(statistics.median(tot_b)
                              / statistics.median(tot_a), 3)},
        "common_total_min": {
            "a": round(min(tot_a), 3), "b": round(min(tot_b), 3),
            "b_over_a": round(min(tot_b) / min(tot_a), 3)},
        "queries": summary,
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

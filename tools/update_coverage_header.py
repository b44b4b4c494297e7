#!/usr/bin/env python
"""Regenerate COVERAGE.md's headline totals FROM the registry — the
hand-typed header drifted in r5 (claimed 169/154/15 while the registry
held 223/205/18, VERDICT r5 #3).  The generated block lives between
`<!-- registry-totals:begin -->` / `<!-- registry-totals:end -->`
markers; everything else in COVERAGE.md stays hand-maintained.

    python tools/update_coverage_header.py           # rewrite in place
    python tools/update_coverage_header.py --check   # exit 1 on drift
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
    REGISTRY,
)

BEGIN = "<!-- registry-totals:begin -->"
END = "<!-- registry-totals:end -->"
COVERAGE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "COVERAGE.md")


def totals_block() -> str:
    total = len(REGISTRY)
    rows_only = sum(1 for s in REGISTRY.values() if s.oracle is None)
    oracle = total - rows_only
    return (
        f"{BEGIN}\n"
        f"Current totals (derived from `pkg/plans/registry.py` by\n"
        f"`tools/update_coverage_header.py` — do not hand-edit):\n"
        f"**{total} registry entries — {oracle} oracle-checked,\n"
        f"{rows_only} rows-only** (the rows-only ones are\n"
        f"probabilistic/sketch/sampler ops, each ground-truthed in\n"
        f"tests). Every oracle-checked entry is bit-exact vs DuckDB\n"
        f"(`tools/check_correctness.py --exact`), including when run\n"
        f"from a foreign non-UTC driver session.\n"
        f"{END}"
    )


def main() -> int:
    check = "--check" in sys.argv
    src = open(COVERAGE).read()
    block = totals_block()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(src):
        print("COVERAGE.md: totals markers missing", file=sys.stderr)
        return 1
    new = pat.sub(lambda _: block, src)
    if check:
        if new != src:
            print("COVERAGE.md totals drifted from registry — run "
                  "tools/update_coverage_header.py", file=sys.stderr)
            return 1
        print("COVERAGE.md totals in sync with registry")
        return 0
    if new != src:
        open(COVERAGE, "w").write(new)
        print("COVERAGE.md totals rewritten")
    else:
        print("COVERAGE.md totals already in sync")
    return 0


if __name__ == "__main__":
    sys.exit(main())

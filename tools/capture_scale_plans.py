#!/usr/bin/env python
"""Capture the join_5way_star broadcast↔SMJ evidence at the perf scale
lake (VERDICT r2 #3). Prints two EXECUTED AQE-final plan summaries:

1. default 10 MB threshold — the selective o_orderdate filter leaves
   the orders build side under threshold at runtime, so AQE (correctly)
   broadcasts: zero fact-table shuffles before the final agg.
2. threshold shrunk to 1 MB — models the build-side/threshold ratio a
   ~400x further scale-up produces; the same comparator now keeps the
   fact⋈orders SortMergeJoin while the hinted tiny dims stay broadcast.

Usage: python tools/capture_scale_plans.py [--sf-dir /tmp/scale_sf1]
The executed-plan test twin lives at
tests/test_plan_quality.py::test_join_5way_star_broadcast_to_smj_transition.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans import (  # noqa: E402
    relational as R,
)


def _join_lines(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    head = plan.splitlines()[0]
    return [head] + [
        ln.strip()[:120] for ln in plan.splitlines() if "Join" in ln
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/scale_sf1")
    args = ap.parse_args()
    spark = get_spark("capture_scale_plans")
    thr = "spark.sql.autoBroadcastJoinThreshold"

    for label, threshold in (("default 10m threshold", None),
                             ("1m threshold (models +400x scale)", "1048576")):
        if threshold is not None:
            spark.conf.set(thr, threshold)
        df = R.join_5way_star(spark, args.sf_dir)
        n = df.count()  # execute so AQE finalizes
        print(f"\n== join_5way_star @ {args.sf_dir} — {label} "
              f"({n} result rows) ==")
        for ln in _join_lines(df):
            print(ln)


if __name__ == "__main__":
    main()

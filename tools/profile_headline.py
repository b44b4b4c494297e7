#!/usr/bin/env python
"""Per-query profile of the headline bench (guide §1: measure first).

For each bench query, after one untimed warm-up pass, splits the
steady-state cost into

- ``build_s``  — Python plan construction, which includes every eager
  driver-side job an operator triggers (quantile sketches, offset
  collects, guard probes);
- ``exec_s``   — the terminal noop action;
- ``jobs``     — Spark job ids consumed during build vs. exec (from the
  status tracker), i.e. how many scheduler round-trips each phase pays.

Prints one JSON line per query plus a total line.  Profiling companion
to bench.py — NOT a replacement (bench.py's medians stay the artifact
of record).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.cache import (  # noqa: E402
    release_persisted,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
    bench_queries,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])
    spark = get_spark("profile_headline")
    spark.range(1000).selectExpr("sum(id)").collect()
    tracker = spark.sparkContext.statusTracker()

    fns = bench_queries()
    items = [(n, f) for n, f in fns.items() if not only or n in only]

    # warm-up pass (file listing, JIT, scoped_persist caches)
    for name, fn in items:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    n_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    out = {}
    for name, fn in items:
        builds, execs, bjobs, ejobs = [], [], [], []
        for _ in range(n_runs):
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = len(tracker.getJobIdsForGroup(None))
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            bjobs.append(j1 - j0)
            ejobs.append(j2 - j1)
        rec = {
            "build_s": round(sorted(builds)[n_runs // 2], 3),
            "exec_s": round(sorted(execs)[n_runs // 2], 3),
            "build_jobs": bjobs[-1],
            "exec_jobs": ejobs[-1],
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    release_persisted()
    total_b = sum(r["build_s"] for r in out.values())
    total_e = sum(r["exec_s"] for r in out.values())
    print(json.dumps({"query": "_total", "build_s": round(total_b, 3),
                      "exec_s": round(total_e, 3),
                      "total_s": round(total_b + total_e, 3)}))


if __name__ == "__main__":
    main()

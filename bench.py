#!/usr/bin/env python
"""Headline benchmark: runs the registry's bench-flagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a count-ish action that forces
every operator (collect would measure driver transfer of wide rows;
``df.write.format("noop")`` forces execution without sink cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
    bench_queries,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm the JVM + file listing once so per-query numbers measure the
    # query, not session bootstrap
    spark.range(1000).selectExpr("sum(id)").collect()

    # One untimed warm-up pass (file listing, code paths, JIT), then
    # N_RUNS timed passes reduced by a trimmed mean (drop min and max,
    # average the rest) — reports steady-state throughput robust to
    # co-resident load spikes (VERDICT r3 #6: n=2-3 single-shot numbers
    # drifted ±15-27 % round-over-round with no code change). Cold-start
    # costs amortize to zero in the 100 TB story.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    items = list(bench_queries().items())
    for name, fn in items:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {name: [] for name, _ in items}
    for _ in range(n_runs):
        for name, fn in items:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)

    def trimmed_mean(xs: list[float]) -> float:
        if len(xs) >= 3:
            xs = sorted(xs)[1:-1]
        return sum(xs) / len(xs)

    per_query = {name: round(trimmed_mean(xs), 3)
                 for name, xs in samples.items()}
    total = sum(per_query.values())

    print(json.dumps({
        "metric": "bench_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "method": f"trimmed mean of n={n_runs} steady-state runs per "
                  "query (min/max dropped) after 1 untimed warm-up pass",
    }))


if __name__ == "__main__":
    main()

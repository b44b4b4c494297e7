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

    # One untimed warm-up pass (file listing, code paths, JIT) then one
    # timed pass — reports steady-state throughput, which is what the
    # 100 TB story is about; cold-start costs amortize to zero there.
    items = list(bench_queries().items())
    for name, fn in items:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    total = 0.0
    for name, fn in items:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        per_query[name] = dt
        total += dt

    print(json.dumps({
        "metric": "bench_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()

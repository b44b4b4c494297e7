#!/usr/bin/env python
"""Solo steady-state profile of dedup_minhash_lsh: n runs in a fresh
session with nothing else co-resident, plus per-run host CPU-steal
deltas (hypervisor preemption shows up as wall-time spikes with flat
in-VM CPU). Companion to diag_minhash_order.py."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
    bench_queries,
)
from tools._stats import trimmed_mean  # noqa: E402


def cpu_jiffies() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), steal


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    name = sys.argv[2] if len(sys.argv) > 2 else "dedup_minhash_lsh"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("diag-minhash-solo")
    fn = bench_queries()[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm

    runs = []
    for i in range(n):
        t_all0, s0 = cpu_jiffies()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        t_all1, s1 = cpu_jiffies()
        runs.append({"wall": round(wall, 3),
                     "steal_pct": round(100.0 * (s1 - s0)
                                        / max(1, t_all1 - t_all0), 2)})
        print(f"run {i + 1}: {wall:.2f}s steal={runs[-1]['steal_pct']}%",
              file=sys.stderr)
    walls = sorted(r["wall"] for r in runs)
    print(json.dumps({
        "query": name, "n": n, "runs": runs,
        "trimmed_mean": round(trimmed_mean(walls), 3),
        "min": walls[0], "max": walls[-1],
    }))


if __name__ == "__main__":
    main()

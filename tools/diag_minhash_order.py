#!/usr/bin/env python
"""One-session interleaved A/B diagnosis of the r3->r4
``dedup_minhash_lsh`` bench doubling (VERDICT r4 "What's wrong" #1).

The r4 registry rotation reordered ``bench_queries()`` so minhash ran
2nd (right after flagship) instead of 10th; the +111 % showed up with
byte-identical minhash code. Cross-session absolutes are untrustworthy
(host loadavg differed 10-15 between rounds), so this script interleaves
the two *orders* in ONE session: passes alternate A(r3 order) / B(r4
order), n passes each, trimmed mean per (order, query). If the minhash
number splits by order, the regression is execution-order context
(shuffle files / GC / memory state), not the operator; if it doesn't,
the r4 figure was a host-load artifact.

Usage: python tools/diag_minhash_order.py [n_passes_per_order]
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
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
    bench_queries,
)

# Exact per-query execution orders from the committed artifacts.
R3_ORDER = [
    "flagship_weather_join", "q1_pricing_summary", "join_inner_3way_topk",
    "join_5way_star", "join_asof_events_orders", "window_topk_per_group",
    "events_tumbling_hour", "events_sessionize", "streaming_tumbling_hour",
    "dedup_minhash_lsh", "dedup_token_jaccard", "ann_cosine_topk",
    "text_token_stats",
]
R4_ORDER = [
    "flagship_weather_join", "dedup_minhash_lsh", "dedup_token_jaccard",
    "ann_cosine_topk", "text_token_stats", "events_tumbling_hour",
    "events_sessionize", "streaming_tumbling_hour", "q1_pricing_summary",
    "join_inner_3way_topk", "join_5way_star", "join_asof_events_orders",
    "window_topk_per_group",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("diag-minhash-order")
    fns = bench_queries()
    assert set(R3_ORDER) == set(R4_ORDER) == set(fns), "bench set changed"

    def run_pass(order: list[str], sink: dict[str, list[float]]) -> None:
        for name in order:
            t0 = time.perf_counter()
            fns[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            sink[name].append(time.perf_counter() - t0)

    # untimed warm-up (r3 order; either would do)
    warm: dict[str, list[float]] = {k: [] for k in fns}
    run_pass(R3_ORDER, warm)

    a: dict[str, list[float]] = {k: [] for k in fns}
    b: dict[str, list[float]] = {k: [] for k in fns}
    for i in range(n):
        run_pass(R3_ORDER, a)   # interleave: A, B, A, B, ...
        run_pass(R4_ORDER, b)
        print(f"pass {i + 1}/{n}: minhash r3-order="
              f"{a['dedup_minhash_lsh'][-1]:.2f}s "
              f"r4-order={b['dedup_minhash_lsh'][-1]:.2f}s",
              file=sys.stderr)

    out = {
        "n_passes_per_order": n,
        "r3_order": {k: round(trimmed_mean(v), 3) for k, v in a.items()},
        "r4_order": {k: round(trimmed_mean(v), 3) for k, v in b.items()},
        "minhash_raw_r3_order": [round(x, 3) for x in a["dedup_minhash_lsh"]],
        "minhash_raw_r4_order": [round(x, 3) for x in b["dedup_minhash_lsh"]],
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Executed A/B for the hot-slice broadcast join (operators/skew.py):
plain shuffle join vs hot_slice_join on a PLANTED hot-key lake, same
session, interleaved runs — measured evidence that the skew remedy
pays for its extra key census, not just a plan-shape assertion.

The planted fact gives one key ~half of all rows (the shape
`events_hot_keys` exists to detect); the dim is made non-broadcastable
by conf so the plain join must shuffle both sides and land the hot key
on a single reducer task.  AQE's skew split is ON for both arms (it is
the production default here), so the A/B isolates what the hot-slice
rewrite adds ON TOP of AQE: the hot rows skip the Exchange entirely.

Usage: python tools/diag_hot_slice.py [n_rows] [n_runs]
Prints one JSON line; record the conclusion in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.skew import (  # noqa: E402
    hot_slice_join,
)
from tools._stats import median  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("diag-hot-slice")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # fact: 50% of rows on key 0, rest uniform over 1..99_999; a wide
    # payload so shuffled bytes dominate compute
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
         .otherwise(F.col("id") % 99_999 + 1).alias("fk"),
        F.concat(F.lit("p" * 64), F.col("id")).alias("payload"))
    dim = spark.range(100_000).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("attr_"), F.col("id")).alias("attr"))
    fact.write.mode("overwrite").parquet("/tmp/diag_hot_fact")
    dim.write.mode("overwrite").parquet("/tmp/diag_hot_dim")
    fact = spark.read.parquet("/tmp/diag_hot_fact")
    dim = spark.read.parquet("/tmp/diag_hot_dim")

    skew = "spark.sql.adaptive.skewJoin.enabled"

    def run_plain(aqe_skew: bool):
        spark.conf.set(skew, str(aqe_skew).lower())
        try:
            fact.join(dim, fact["fk"] == dim["dk"], "inner") \
                .write.format("noop").mode("overwrite").save()
        finally:
            spark.conf.set(skew, "true")

    def run_hot():
        # the static rewrite needs no AQE — leave skew handling on for
        # its cold remainder, as production would
        hot_slice_join(fact, dim, "fk", "dk", n_hot=10) \
            .write.format("noop").mode("overwrite").save()

    run_plain(True); run_plain(False); run_hot()     # warm all lineages
    arms: dict[str, list[float]] = {
        "plain_aqe_skew": [], "plain_no_aqe_skew": [], "hot_slice": []}
    for _ in range(n_runs):                          # interleaved A/B/C
        t0 = time.perf_counter(); run_plain(True)
        arms["plain_aqe_skew"].append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter(); run_plain(False)
        arms["plain_no_aqe_skew"].append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter(); run_hot()
        arms["hot_slice"].append(round(time.perf_counter() - t0, 3))

    med = {k: median(v) for k, v in arms.items()}
    out = {
        "metric": "diag_hot_slice_ab",
        "n_rows": n_rows,
        "hot_share": 0.5,
        "runs": arms,
        "medians": med,
        "hot_slice_vs_no_aqe_x": round(
            med["plain_no_aqe_skew"] / med["hot_slice"], 3),
        "hot_slice_vs_aqe_x": round(
            med["plain_aqe_skew"] / med["hot_slice"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

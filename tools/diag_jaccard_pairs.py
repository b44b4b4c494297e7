#!/usr/bin/env python
"""Constant-work proof for the classic-lake ``dedup_token_jaccard``
scale ratio (r12): census the PPJoin detector's WORK — prefix rows,
raw prefix-join fanout, distinct candidate pairs, verified pairs,
widest (block, token) bucket — per lake, instead of re-timing it.

Same methodology as ``diag_minhash_pairs.py`` (which closed the
classic-lake minhash episode in r11): the classic lake replicates each
source doc ``reps`` times verbatim, so every near-dup cluster grows
``reps``-wide and the prefix×prefix self-join's per-cluster fanout
grows ~reps² BY CONSTRUCTION — super-linear *input pairs*, not a
super-linear *algorithm*.  The fair lake (constant cluster width)
isolates the algorithm.

The census reuses the operator's own factored stages
(``prefix_filter_rows`` / ``prefix_join_candidates``,
operators/dedup.py) under the registry entry's exact geometry
(plans/extensions.dedup_token_jaccard: lang block + n_chars/16 length
band, min_jaccard 0.4), so it measures the production candidate
stage, not a reimplementation.

Usage::

    python tools/diag_jaccard_pairs.py [--out DIAG_jaccard_pairs.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.functions.text import (  # noqa: E402
    tokens,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.cache import (  # noqa: E402
    release_persisted,
    scoped_persist,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.dedup import (  # noqa: E402
    prefix_filter_rows,
    prefix_join_candidates,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.tables import (  # noqa: E402
    read_parquet_table,
)

# the registry entry's exact geometry (plans/extensions.dedup_token_jaccard)
ID_COL = "doc_id"
BLOCK_COLS = ["lang"]
LENGTH_COL = "n_chars"
LENGTH_BAND = 16
MIN_JACCARD = 0.4
JOIN_KEYS = [*BLOCK_COLS, "len_band"]


def census(spark, sf_dir: str) -> dict:
    docs = read_parquet_table(spark, sf_dir, "documents")
    t = docs.select(
        F.col(ID_COL),
        *[F.col(c) for c in BLOCK_COLS],
        (F.col(LENGTH_COL) / LENGTH_BAND).cast("long").alias("len_band"),
        F.array_distinct(tokens(F.col("text"))).alias("tokset"))
    t = scoped_persist(t)

    n_docs = docs.count()
    prefix_rows = prefix_filter_rows(t, ID_COL, JOIN_KEYS, MIN_JACCARD)
    prefix_rows = scoped_persist(prefix_rows)
    n_prefix = prefix_rows.count()
    widths = (prefix_rows.groupBy(*JOIN_KEYS, "tok")
              .agg(F.count(F.lit(1)).alias("w")))
    w_stats = widths.agg(
        F.max("w").alias("max_w"),
        # raw self-join fanout = sum over buckets of w*(w-1)/2
        F.sum(F.col("w") * (F.col("w") - 1) / 2).alias("raw_fanout"),
        F.count(F.lit(1)).alias("n_buckets")).first()
    cands = prefix_join_candidates(prefix_rows, ID_COL, JOIN_KEYS)
    n_pairs = cands.count()
    sets = t.select(ID_COL, "tokset")
    verify = (
        cands
        .join(sets.select(F.col(ID_COL).alias("id_a"),
                          F.col("tokset").alias("ts_a")), "id_a")
        .join(sets.select(F.col(ID_COL).alias("id_b"),
                          F.col("tokset").alias("ts_b")), "id_b")
        .where(F.round(
            F.size(F.array_intersect("ts_a", "ts_b")).cast("double")
            / F.size(F.array_union("ts_a", "ts_b")).cast("double"),
            4) >= MIN_JACCARD))
    n_verified = verify.count()
    release_persisted()
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_prefix_rows": n_prefix,
        "n_prefix_buckets": int(w_stats["n_buckets"]),
        "max_bucket_width": int(w_stats["max_w"]),
        "raw_join_fanout": int(w_stats["raw_fanout"]),
        "distinct_candidate_pairs": n_pairs,
        "verified_pairs": n_verified,
        "pairs_per_doc": round(n_pairs / n_docs, 4),
        "fanout_per_doc": round(int(w_stats["raw_fanout"]) / n_docs, 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DIAG_jaccard_pairs.json")
    ap.add_argument("--lakes", nargs="*", default=[
        "/root/testdata/sf0.1", "/tmp/scale_sf1", "/tmp/scale_sf1_fair"])
    args = ap.parse_args()
    spark = get_spark("diag_jaccard_pairs")
    out = {"lakes": [census(spark, lake) for lake in args.lakes]}
    base = out["lakes"][0]
    for row in out["lakes"][1:]:
        scale = row["n_docs"] / base["n_docs"]
        row["docs_scale_vs_base"] = round(scale, 2)
        row["pairs_growth_vs_linear"] = round(
            row["distinct_candidate_pairs"]
            / (base["distinct_candidate_pairs"] * scale), 4)
        row["fanout_growth_vs_linear"] = round(
            row["raw_join_fanout"] / (base["raw_join_fanout"] * scale), 4)
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Constant-work proof for the classic-lake ``dedup_minhash_lsh``
scale episode (VERDICT r10 #2): census the detector's WORK — banded
rows, raw band-join fanout, distinct candidate pairs, verified pairs,
widest band bucket — per lake, instead of re-timing it.

The r10 artifact read 1.09×/1.14× (median/min) vs linear for minhash
on the CLASSIC sf0.1→sf1 lake while the dedup-fair twin read 0.56×.
The two lakes differ only in construction: the classic lake replicates
each source doc ``reps`` times verbatim (modulo key remap), so every
near-dup cluster grows ``reps``-wide and the band join's per-cluster
fanout grows ~reps² BY CONSTRUCTION — super-linear *input pairs*, not
a super-linear *algorithm*.  The fair lake (per-token ␞i sentinel
suffix) keeps cluster width constant, isolating the algorithm.

This census settles which story the wall-clock ratio reflects: if
pairs-per-doc is ~flat on the fair lake but grows ~reps× on the
classic lake while task/shuffle structure stays the banded equi-join,
the drift is lake-construction pair growth (scope linearity claims to
the fair lake — BASELINE.md); a real regression would show pair
growth on BOTH lakes or a plan change.

Usage::

    python tools/diag_minhash_pairs.py [--out DIAG_minhash_pairs.json]
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
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.cache import (  # noqa: E402
    release_persisted,
    scoped_persist,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.dedup import (  # noqa: E402
    _minhash_banded,
    _verify_shingle_jaccard,
    band_join_candidates,
    cap_band_buckets,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.tables import (  # noqa: E402
    read_parquet_table,
)

# the registry entry's exact geometry (plans/extensions.dedup_minhash_lsh)
GEOM = dict(shingle_size=3, num_bands=8, rows_per_band=2, seed=42)
MAX_BAND_BUCKET = 512
MAX_DIST = 0.5


def census(spark, sf_dir: str) -> dict:
    docs = read_parquet_table(spark, sf_dir, "documents")
    banded, sets = _minhash_banded(docs, "text", "doc_id", **GEOM)
    banded = scoped_persist(banded)
    capped = cap_band_buckets(banded, MAX_BAND_BUCKET)
    capped = scoped_persist(capped)

    n_docs = docs.count()
    n_banded = banded.count()
    widths = (banded.groupBy("band_idx", "band_hash")
              .agg(F.count(F.lit(1)).alias("w")))
    w_stats = widths.agg(
        F.max("w").alias("max_w"),
        # raw self-join fanout = sum over buckets of w*(w-1)/2
        F.sum(F.col("w") * (F.col("w") - 1) / 2).alias("raw_fanout"),
        F.count(F.lit(1)).alias("n_buckets")).first()
    n_dropped = banded.count() - capped.count()
    cands = band_join_candidates(capped, "doc_id")
    n_pairs = cands.count()
    n_verified = _verify_shingle_jaccard(
        cands, sets, "doc_id", MAX_DIST).count()
    release_persisted()
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_banded_rows": n_banded,
        "n_band_buckets": int(w_stats["n_buckets"]),
        "max_bucket_width": int(w_stats["max_w"]),
        "raw_join_fanout": int(w_stats["raw_fanout"]),
        "banded_rows_dropped_by_cap": int(n_dropped),
        "distinct_candidate_pairs": n_pairs,
        "verified_pairs": n_verified,
        "pairs_per_doc": round(n_pairs / n_docs, 4),
        "fanout_per_doc": round(int(w_stats["raw_fanout"]) / n_docs, 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DIAG_minhash_pairs.json")
    ap.add_argument("--lakes", nargs="*", default=[
        "/root/testdata/sf0.1", "/tmp/scale_sf1", "/tmp/scale_sf1_fair"])
    args = ap.parse_args()
    spark = get_spark("diag_minhash_pairs")
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

#!/usr/bin/env python
"""Per-round sf1 scale bench (VERDICT r4 #2): guard the sublinear
dedup/ANN shapes with a committed, repeatable artifact instead of
hand-run sessions.

Builds the 10× perf lake via tools/make_scale_lake.py if absent, then
runs the scale-critical queries (flagship_weather_join,
dedup_minhash_lsh, dedup_token_jaccard, ann_cosine_topk, and the
bipartite dedup_incremental_lsh) with one
untimed warm-up and the MEDIAN of n timed runs each (median, not mean:
the host exhibits intermittent 10-35 s stalls — see the r5 diagnosis
in BASELINE.md), and emits ONE JSON line to stdout; redirect or tee to
``BENCH_scale_r{N}.json``.

Per-query sublinearity is reported as ``x_vs_linear`` = sf1_sec /
(reps × sf0.1_sec) using the *same-session* sf0.1 medians, so the
ratio is immune to cross-day host drift.

Usage: python tools/bench_scale.py [--lake /tmp/scale_sf1] [--reps 10]
                                   [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
    queries,
)
from tools._stats import median  # noqa: E402

from bench import _cpu_times, _steal_pct  # noqa: E402  (repo root)

SCALE_QUERIES = [
    "flagship_weather_join",
    "dedup_minhash_lsh",
    "dedup_token_jaccard",
    "ann_cosine_topk",
    # r5 addition: the bipartite incremental-ingest dedup shape
    "dedup_incremental_lsh",
    # r5b additions: the two-phase prefix-sum (shard packing — would be
    # a single-partition window if naively planned) and the
    # span-census shuffle (C4 line dedup — groupBy on content)
    "corpus_shard_pack",
    "text_line_dedup",
    # r5c addition: the Bloom-prefiltered semi-join (the prefilter must
    # keep paying for itself as the fact side grows)
    "join_bloom_prefilter",
    # r5d addition: sequence packing — prefix-sum + boundary fanout;
    # the training-loader shape whose naive plan is a global window
    "corpus_seq_pack",
    # r5d6 addition: DSIR importance weights — the hashed-ngram census
    # + broadcast-λ shape; must stay linear in the token stream
    "corpus_dsir_weights",
    # r6 addition: the full loader capstone (selection cut → sequence
    # packing → epoch shuffle) now that its recompute bug is fixed —
    # composition must stay sublinear, not only its stages
    "corpus_loader_pipeline",
    # r7 additions: the migration-checksum single-shuffle map-agg and
    # the path-mining narrowing-agg chain — both must stay linear in
    # rows with no new plan shape at 10×
    "table_checksum",
    "events_top_paths",
    # r7b addition: the hot-slice broadcast join — the skew remedy must
    # keep its two-path shape (hot rows never shuffle) as the fact and
    # the hot-key census both grow 10×
    "join_hot_slice_broadcast",
    # r7d addition: the inverted-index build — the (token, doc) census
    # plus the WindowGroupLimit posting cap must stay linear in the
    # token stream; a 10× lake multiplies every posting list's depth
    # but the cap keeps reducer output constant per token
    "text_inverted_index",
    # r8 additions — four shapes the set had never measured at 10×:
    # hybrid retrieval (BM25 census + dense arm, each reduced to a
    # ≤ n_arm top-k BEFORE the rank windows — the reductions must keep
    # the partitionless windows constant-size as the corpus grows)
    "retrieval_hybrid_rrf",
    # curriculum manifest (two-phase serial_id prefix sum over every
    # doc — the naive plan is ONE global sort; the range-bucketed id
    # must stay linear)
    "corpus_curriculum_order",
    # full-salting skew remedy (dim replicated salt_buckets× map-side;
    # the fact-side shuffle must scale with rows, not with the hot key)
    "join_salted_replicate",
    # filtered ANN (the label PushedFilter must keep pruning row
    # groups BEFORE vector math — at 10× the pruned fraction is the
    # whole win)
    "ann_filtered_topk",
    # r10 addition: the warehouse-ETL MERGE shape (headline as of r10)
    # — a full-outer SMJ whose both sides grow with the lake; the
    # minimal-plan claim (no second join/window) must keep it linear
    "etl_scd2_apply",
    # r10 addition: the single-shuffle funnel family — three chained
    # whole-partition windows + per-user reduce on ONE user_id
    # exchange; the claim that the window stack never adds a second
    # event-log shuffle must hold as the log grows
    "events_funnel",
    # r11 addition (VERDICT r10 #3): the r10 single-shuffle retention
    # re-plan — one user_id exchange, collect_set bounded by timeline
    # weeks — was motivated by scale but never measured at 10×; the
    # bounded-set claim must hold as events-per-user grows with reps
    "events_cohort_retention",
]


def ensure_lake(lake: str, src: str, reps: int,
                dedup_fair: bool = False) -> dict:
    """Build the scale lake if absent, REBUILD it if it was built with
    different parameters (ADVICE r9: benching a dedup-fair run against
    a classic-mode lake — or vice versa — silently mislabels the
    evidence).  make_scale_lake.py writes ``_meta.json`` LAST, so its
    presence is both the completed-build marker and the provenance
    record; pre-meta lakes (unknown mode) are rebuilt rather than
    guessed at.  Returns the lake's metadata — the artifact's
    ``dedup_fair`` field derives from THIS, not from the CLI flag."""
    import glob
    import json
    meta_path = os.path.join(lake, "_meta.json")
    want = {"src": os.path.normpath(src), "reps": reps,
            "dedup_fair": bool(dedup_fair)}
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        got = {"src": os.path.normpath(meta.get("src", "")),
               "reps": meta.get("reps"),
               "dedup_fair": meta.get("dedup_fair")}
        if got == want:
            return meta
        print(f"lake at {lake} was built as {got}, this run needs "
              f"{want} — rebuilding", file=sys.stderr)
    elif os.path.exists(os.path.join(lake, "embeddings.parquet")):
        print(f"lake at {lake} predates _meta.json (mode unknown) — "
              "rebuilding", file=sys.stderr)
    for stale in glob.glob(os.path.join(lake, "*.parquet")):
        os.remove(stale)
    if os.path.exists(meta_path):
        os.remove(meta_path)
    print(f"building {reps}x scale lake at {lake} ...", file=sys.stderr)
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "make_scale_lake.py"),
           "--src", src, "--out", lake, "--reps", str(reps)]
    if dedup_fair:
        cmd.append("--dedup-fair")
    subprocess.run(cmd, check=True)
    return json.load(open(meta_path))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lake", default="/tmp/scale_sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of SCALE_QUERIES (r9: "
                         "lets a second-decade probe — e.g. --src "
                         "/tmp/scale_sf1 --lake /tmp/scale_sf10 — run "
                         "only the shapes worth 100x-scale wall-clock)")
    ap.add_argument("--metric", default="bench_scale_sf1",
                    help="metric label for the emitted record")
    ap.add_argument("--dedup-fair", action="store_true",
                    help="build the lake with make_scale_lake.py "
                         "--dedup-fair (constant duplicate-cluster "
                         "width — the construction under which a dedup "
                         "linearity ratio is meaningful); recorded in "
                         "the artifact")
    args = ap.parse_args()

    names = (args.queries.split(",") if args.queries else SCALE_QUERIES)
    unknown = sorted(set(names) - set(SCALE_QUERIES))
    if unknown:
        raise SystemExit(f"--queries not in SCALE_QUERIES: {unknown}")

    lake_meta = ensure_lake(args.lake, args.src, args.reps,
                            dedup_fair=args.dedup_fair)
    spark = get_spark("bench-scale")
    fns = {name: queries()[name] for name in names}

    # INTERLEAVED passes (r8): the old shape profiled every sf0.1 pass,
    # THEN every sf1 pass — two sequential phases, each minutes long on
    # this host, so a co-tenant contention episode lands on ONE side of
    # the ratio and whiplashes x_vs_linear both ways (observed same-day:
    # one artifact read token_jaccard 0.41x with a contended sf0.1
    # phase, the next 2.1x with a contended sf1 phase — identical
    # code).  Alternating small-pass/big-pass samples both lakes across
    # the SAME contention timeline, the within-session analog of the
    # interleaved A/B the repo already uses for adjudications.
    def one_pass(sf_dir: str, samples: dict[str, list[float]]) -> None:
        for name, fn in fns.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)

    for fn in fns.values():  # untimed warm-up, both lakes
        fn(spark, args.src).write.format("noop").mode("overwrite").save()
        fn(spark, args.lake).write.format("noop").mode("overwrite").save()
    s_small: dict[str, list[float]] = {n: [] for n in fns}
    s_big: dict[str, list[float]] = {n: [] for n in fns}
    c0 = _cpu_times()
    for _ in range(args.runs):
        one_pass(args.src, s_small)
        one_pass(args.lake, s_big)
    steal = _steal_pct(c0, _cpu_times())

    # Ratios divide by the UNROUNDED small-lake reading, floored at
    # 1 ms (ADVICE r8: a sub-millisecond timing would round to 0.0 and
    # the division would abort the whole artifact emission — only the
    # REPORTED seconds are rounded, never a divisor).
    def _guard(x: float) -> float:
        return max(x, 1e-3)

    small_raw = {n: median(xs) for n, xs in s_small.items()}
    small_min_raw = {n: min(xs) for n, xs in s_small.items()}
    small = {n: round(x, 3) for n, x in small_raw.items()}
    small_min = {n: round(x, 3) for n, x in small_min_raw.items()}
    big = {n: round(median(xs), 3) for n, xs in s_big.items()}
    big_min = {n: round(min(xs), 3) for n, xs in s_big.items()}

    out = {
        "metric": args.metric,
        "unit": "sec",
        "reps": args.reps,
        "src": args.src,
        "lake": args.lake,
        # derived from the lake's _meta.json, not the CLI flag — the
        # artifact labels what was actually benched (ADVICE r9)
        "dedup_fair": bool(lake_meta["dedup_fair"]),
        "runs_per_query": args.runs,
        "sf0_1_sec": small,
        "sf1_sec": big,
        "x_vs_linear": {
            n: round(big[n] / (args.reps * _guard(small_raw[n])), 3)
            for n in fns},
        # min-based ratio (r8, same rationale as bench.py queries_min):
        # a host stall can only ADD time, and with a median of n=3 a
        # single stalled run on one side already skews the ratio — a
        # stall during a sf1 run fakes a scale regression, one during
        # a sf0.1 run fakes super-linearity of everything.  The
        # min/min ratio is the stall-immune reading; judge a claimed
        # scale regression against THIS before re-litigating a shape.
        "x_vs_linear_min": {
            n: round(big_min[n] / (args.reps * _guard(small_min_raw[n])), 3)
            for n in fns},
        # same self-annotation as bench.py: ≈0 on a quiet host,
        # 1.4-7.2 % during the documented co-tenant episodes — read
        # elevated-steal ratios against x_vs_linear_min first
        "steal_pct": steal,
        "method": "median of n INTERLEAVED small/big passes after 1 "
                  "untimed warm-up — alternating lakes samples both "
                  "sides of every ratio across the same contention "
                  "timeline, so x_vs_linear is host-drift-immune "
                  "within the session too; x_vs_linear_min is "
                  "min-based and additionally stall-immune",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

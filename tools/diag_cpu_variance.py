#!/usr/bin/env python
"""Constant-work proof for run-to-run latency variance (r9, VERDICT r8
#2): re-run one registry query N times with the Spark event log on,
then aggregate per-run task metrics from the log.  If task counts and
shuffle record counts are IDENTICAL across runs while per-run executor
CPU time differs, the plan and the work are constant and the slowdown
is cycles-per-instruction inflation — shared-hardware contention
(memory bandwidth / LLC / frequency) that /proc/stat steal does NOT
capture — not a code regression, not AQE nondeterminism, not spill.

This is the instrument that closed the dedup_token_jaccard sf1 median
episode (BASELINE.md round-9 section): 6 solo runs at the 10x lake,
every run 155 tasks / 105.55M shuffle records / 0 bytes spilled /
GC <= 11 s, while executor CPU ranged 422 s (21.5 s wall) to 1167 s
(76 s wall) under steal < 0.6 %.

Usage::

    python tools/diag_cpu_variance.py [--query dedup_token_jaccard]
                                      [--sf /tmp/scale_sf1] [--runs 6]
"""

from __future__ import annotations

import argparse
import collections
import glob
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_eventlog(event_dir: str) -> dict[str, collections.Counter]:
    """Aggregate TaskEnd metrics per job-group over every log in
    ``event_dir`` (zstd rolling logs included)."""
    try:
        import zstandard as zstd
        dctx = zstd.ZstdDecompressor()

        def opener(p):
            if p.endswith(".zstd"):
                return io.TextIOWrapper(dctx.stream_reader(open(p, "rb")),
                                        encoding="utf-8")
            return open(p)
    except ImportError:  # pragma: no cover - zstandard ships with pyspark
        def opener(p):
            return open(p)

    agg: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter)
    stage_to_run: dict[int, str] = {}
    paths = sorted(glob.glob(os.path.join(event_dir, "**", "events_*"),
                             recursive=True))
    for path in paths:
        for line in opener(path):
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                grp = (e.get("Properties") or {}).get(
                    "spark.jobGroup.id", "?")
                for sid in e.get("Stage IDs", []):
                    stage_to_run[sid] = grp
            elif ev == "SparkListenerTaskEnd":
                run = stage_to_run.get(e["Stage ID"], "?")
                m = e.get("Task Metrics") or {}
                c = agg[run]
                c["tasks"] += 1
                c["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                c["run_s"] += m.get("Executor Run Time", 0) / 1e3
                c["gc_s"] += m.get("JVM GC Time", 0) / 1e3
                c["spill_disk"] += m.get("Disk Bytes Spilled", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                c["sh_read_rec"] += sr.get("Total Records Read", 0)
                c["sh_write_rec"] += sw.get("Shuffle Records Written", 0)
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="dedup_token_jaccard")
    ap.add_argument("--sf", default="/tmp/scale_sf1")
    ap.add_argument("--runs", type=int, default=6)
    args = ap.parse_args()

    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
        get_spark,
    )
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
        queries,
    )

    event_dir = tempfile.mkdtemp(prefix="cw_spark_events_")
    spark = get_spark("diag-cpu-variance", extra_confs={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": event_dir,
    })
    sc = spark.sparkContext
    fn = queries()[args.query]
    walls = []
    for i in range(args.runs):
        sc.setJobGroup(f"run{i}", args.query)
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
        print(f"run{i}: wall {walls[-1]:.2f}s", flush=True)
    spark.stop()  # flush the event log

    agg = parse_eventlog(event_dir)
    print(f"\nper-run task metrics ({args.query} @ {args.sf}):")
    keys = [k for k in sorted(agg) if k.startswith("run")]
    for k in keys:
        c = agg[k]
        print(f"{k}: tasks {c['tasks']:6d}  cpu {c['cpu_s']:8.1f}s  "
              f"gc {c['gc_s']:5.1f}s  spillD {c['spill_disk']/2**30:5.2f}G  "
              f"shuffle {c['sh_read_rec']/1e6:8.2f}M rec")
    # run0 carries cache-population stages; compare the steady-state runs
    steady = keys[1:]
    works = {(agg[k]["tasks"], agg[k]["sh_read_rec"]) for k in steady}
    cpus = [agg[k]["cpu_s"] for k in steady]
    if len(works) == 1 and cpus:
        spread = max(cpus) / max(min(cpus), 1e-9)
        print(f"\nwork constant across steady-state runs "
              f"(tasks/records identical); CPU spread {spread:.2f}x -> "
              + ("cycles-per-record inflation: HARDWARE contention, "
                 "not a code/plan difference" if spread > 1.5
                 else "no significant variance this session"))
    else:
        print("\nWORK DIFFERS between runs (task/record counts not "
              "identical) -> investigate plan nondeterminism (AQE, "
              "cache state), this IS potentially code-caused")


if __name__ == "__main__":
    main()

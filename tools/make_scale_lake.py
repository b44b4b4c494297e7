#!/usr/bin/env python
"""Build a perf-only scaled-up lake from the driver's sf0.1 parquet
(VERDICT r1 #6: expose the broadcast→SMJ / AQE transitions that only
appear past bench scale).

Replicates every table R times with per-replica key shifts so each
replica is a self-contained shard: joins keep their fanout, aggregates
scale linearly, and key uniqueness is preserved. Shared tiny dims
(region, nation) are not replicated. Document text gets a per-replica
suffix token so the dedup family sees near-duplicates (not exact
copies, which would distort pair counts).

Usage: python tools/make_scale_lake.py [--src /root/testdata/sf0.1]
                                       [--out /tmp/scale_sf1] [--reps 10]

This is NOT correctness testdata — oracle checks stay on the driver's
own lakes.
"""

from __future__ import annotations

import argparse
import os

import duckdb

# table -> (key columns to shift, text column to suffix or None)
SHIFTS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# which shifted column uses which stride source table/column
STRIDE_SRC = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_sf1")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dedup-fair", action="store_true",
                    help="suffix EVERY token of replica i's documents "
                         "with ␞i (not just the document tail; ␞ is a "
                         "reserved sentinel no source token contains — "
                         "ADVICE r9: a plain _i suffix would collide "
                         "with source tokens that already end in _N, "
                         "breaking the disjoint-images guarantee): a "
                         "bijective token mapping per replica, so "
                         "intra-replica near-dup structure is exactly "
                         "preserved while cross-replica token/shingle "
                         "overlap is ZERO. Duplicate-cluster width then "
                         "stays constant as replicas grow — the lake a "
                         "dedup linearity claim needs (the default "
                         "per-doc suffix widens every cluster with the "
                         "replica count, growing pair counts "
                         "quadratically by construction)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    strides = {}
    for col, (tab, src_col) in STRIDE_SRC.items():
        strides[col] = con.sql(
            f"SELECT max({src_col}) + 1 FROM '{args.src}/{tab}.parquet'"
        ).fetchone()[0]

    for tab, shift_cols in SHIFTS.items():
        src = f"'{args.src}/{tab}.parquet'"
        out = os.path.join(args.out, f"{tab}.parquet")
        if not shift_cols:                      # shared dim: copy once
            con.sql(f"COPY (SELECT * FROM {src}) TO '{out}' (FORMAT PARQUET)")
            continue
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        selects = []
        for i in range(args.reps):
            exprs = []
            for c in cols:
                if c in shift_cols:
                    exprs.append(f"{c} + {i * strides[c]} AS {c}")
                elif (tab == "documents" and c == "text" and i > 0
                      and args.dedup_fair):
                    exprs.append(
                        r"array_to_string(list_transform("
                        r"regexp_split_to_array(trim(text), '\s+'), "
                        f"t -> t || '␞{i}'), ' ') AS text")
                elif (tab == "documents" and c == "n_chars" and i > 0
                      and args.dedup_fair):
                    # recompute from the rewritten text (every token grew)
                    exprs.append(
                        r"length(array_to_string(list_transform("
                        r"regexp_split_to_array(trim(text), '\s+'), "
                        f"t -> t || '␞{i}'), ' ')) AS n_chars")
                elif tab == "documents" and c == "text" and i > 0:
                    exprs.append(f"text || ' r{i}' AS text")
                elif tab == "documents" and c == "n_chars" and i > 0:
                    exprs.append(f"n_chars + {len(f' r{i}')} AS n_chars")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM {src}")
        con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO '{out}' "
                f"(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{tab}: {n} rows")

    # build provenance (ADVICE r9): consumers (bench_scale.ensure_lake)
    # must be able to tell WHICH mode built this lake — a dedup-fair
    # linearity claim against a classic-mode lake is mislabeled evidence.
    # Written LAST, after every table, so it doubles as the
    # completed-build marker.
    import json
    with open(os.path.join(args.out, "_meta.json"), "w") as fh:
        json.dump({"src": args.src, "reps": args.reps,
                   "dedup_fair": bool(args.dedup_fair)}, fh)


if __name__ == "__main__":
    main()

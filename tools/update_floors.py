#!/usr/bin/env python
"""Floor-lowering with the two-session agreement rule (VERDICT r8 #3).

The floor table (tools/floors.json, mirrored prose in BASELINE.md) is
load-bearing for the 2x perf gate, so lowering it must not be possible
from one lucky sample: a single fast min would ratchet floors down and
drift the gate builder-favorable.  The rule this tool enforces:

- A floor LOWERS only from a **steal-flat** run (``steal_pct < 0.5``
  and ``steal_pct_max_run < 0.5``): elevated-steal observations never
  move a floor in either direction (they gate via check_floors.py's
  min-based reading instead).
- The FIRST steal-flat ``queries_min`` below a floor is recorded as a
  ``candidate`` {value, source, steal_pct} — the floor itself does
  not move.
- A SECOND steal-flat min below the floor from a **different source
  label** promotes: new floor = max(candidate value, new min) — the
  value BOTH sessions demonstrably achieved, so one outlier sample
  can never set the floor by itself.  The candidate is cleared and
  provenance records both sources.
- Same-source re-observations only refresh the candidate (keeping the
  larger value — again conservative).

``--source`` is mandatory and should name the session/artifact (e.g.
"r9 battery bench", "BENCH_r09.json") so 'independent sessions' is an
auditable label, not an honor-system claim.

Usage::

    python tools/update_floors.py BENCH.json --source "r9 battery"
    python tools/update_floors.py BENCH.json --source ... --add-missing

``--add-missing`` seeds a floor for a NEW bench query (no existing
entry) directly from this run's min — new queries need a starting
floor; the two-session rule applies to all subsequent lowering.
"""

from __future__ import annotations

import argparse
import json
import sys

from check_floors import FLOORS_PATH, STEAL_FLAT, load_bench_record


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", help="bench.py JSON record path")
    ap.add_argument("--source", required=True,
                    help="session/artifact label for the agreement rule")
    ap.add_argument("--floors", default=FLOORS_PATH)
    ap.add_argument("--add-missing", action="store_true",
                    help="seed floors for bench queries with no entry")
    args = ap.parse_args()

    raw = open(args.bench).read()
    bench = load_bench_record(raw)
    steal = bench.get("steal_pct")
    steal_max = bench.get("steal_pct_max_run")
    flat = (steal is not None and steal < STEAL_FLAT
            and (steal_max is None or steal_max < STEAL_FLAT))
    minima = bench.get("queries_min") or bench.get("queries") or {}

    with open(args.floors) as f:
        doc = json.load(f)
    floors = doc["floors"]
    changed = False

    for q, mn in minima.items():
        if q not in floors:
            if args.add_missing:
                floors[q] = {"floor": round(mn, 3),
                             "provenance": f"seeded from {args.source} "
                                           f"queries_min (steal {steal}%)"}
                print(f"seeded   {q}: floor {mn:.3f}")
                changed = True
            else:
                print(f"skip     {q}: no floor entry (--add-missing to seed)")
            continue
        ent = floors[q]
        if mn >= ent["floor"]:
            continue
        if not flat:
            print(f"refuse   {q}: min {mn:.3f} < floor {ent['floor']:.3f} "
                  f"but run is not steal-flat (steal {steal}% / max-run "
                  f"{steal_max}%) — elevated-steal runs never move floors")
            continue
        cand = ent.get("candidate")
        if cand and cand.get("source") != args.source:
            new_floor = round(max(cand["value"], mn), 3)
            ent["floor"] = new_floor
            ent["provenance"] = (
                f"two-session agreement: {cand['source']} "
                f"({cand['value']:.3f}, steal {cand.get('steal_pct')}%) + "
                f"{args.source} ({mn:.3f}, steal {steal}%)")
            del ent["candidate"]
            print(f"LOWERED  {q}: floor -> {new_floor:.3f} "
                  "(two steal-flat sessions agree)")
            changed = True
        else:
            keep = max(mn, cand["value"]) if cand else mn
            ent["candidate"] = {"value": round(keep, 3),
                                "source": args.source,
                                "steal_pct": steal}
            print(f"candidate {q}: {keep:.3f} from {args.source} — floor "
                  f"{ent['floor']:.3f} unchanged until a second "
                  "independent steal-flat session confirms")
            changed = True

    if changed:
        with open(args.floors, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
        print(f"wrote {args.floors}")
    else:
        print("no changes")
    return 0


if __name__ == "__main__":
    sys.exit(main())

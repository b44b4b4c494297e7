"""Floor/2x bench-gate machinery (VERDICT r8 #3): the gate's reading
rule and the two-session floor-lowering rule are load-bearing for the
perf verdict, so they are pinned here as pure-Python tests (no Spark).

Rule matrix under test (BASELINE.md round-9 mechanization):
- min > 2x floor           -> FAIL regardless of steal
- steal-flat median > 2x   -> FAIL (no stall story on a quiet host)
- elevated-steal median>2x -> PENDING (min-based reading), exit green
- bench query w/o floor    -> FAIL (new queries must land with floors)
- floor lowering: steal-flat + two independent source labels, floor
  moves to max(the two minima); elevated steal never moves a floor.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

from check_floors import check, load_bench_record  # noqa: E402

FLOORS = {"q": {"floor": 1.0}}


def _rec(med, mn, steal, steal_max=None):
    return {"queries": {"q": med}, "queries_min": {"q": mn},
            "steal_pct": steal, "steal_pct_max_run": steal_max}


def test_min_over_2x_fails_even_under_steal():
    failures, pending = check(_rec(3.0, 2.5, steal=5.0), FLOORS)
    assert failures and not pending


def test_flat_median_over_2x_fails():
    failures, pending = check(_rec(2.5, 1.1, steal=0.1, steal_max=0.2),
                              FLOORS)
    assert failures and not pending


def test_elevated_median_over_2x_is_pending_not_fail():
    failures, pending = check(_rec(2.5, 1.1, steal=3.0, steal_max=8.0),
                              FLOORS)
    assert not failures and pending
    assert "steal-flat" in pending[0]


def test_unknown_steal_treated_as_elevated():
    # no /proc/stat: min still gates hard, median only warns
    failures, pending = check(_rec(2.5, 1.1, steal=None), FLOORS)
    assert not failures and pending


def test_within_2x_green():
    failures, pending = check(_rec(1.8, 1.2, steal=0.1, steal_max=0.2),
                              FLOORS)
    assert not failures and not pending


def test_query_without_floor_fails():
    rec = {"queries": {"newq": 0.5}, "queries_min": {"newq": 0.4},
           "steal_pct": 0.1}
    failures, _ = check(rec, FLOORS)
    assert failures and "no floor" in failures[0]


def test_load_bench_record_all_three_shapes():
    rec = {"queries": {"q": 1.0}, "steal_pct": 0.1}
    assert load_bench_record(json.dumps(rec)) == rec
    assert load_bench_record(json.dumps({"n": 1, "parsed": rec})) == rec
    transcript = "warming up\n" + json.dumps(rec) + "\n"
    assert load_bench_record(transcript) == rec


def _update(bench_path, floors_path, source):
    return subprocess.run(
        [sys.executable, str(ROOT / "tools" / "update_floors.py"),
         str(bench_path), "--source", source, "--floors",
         str(floors_path)],
        capture_output=True, text=True)


def test_two_session_lowering_flow(tmp_path):
    floors_path = tmp_path / "floors.json"
    floors_path.write_text(json.dumps(
        {"floors": {"q": {"floor": 1.0, "provenance": "seed"}}}))

    # elevated-steal observation below floor: refused, floor unchanged
    hot = tmp_path / "hot.json"
    hot.write_text(json.dumps(_rec(0.9, 0.8, steal=3.0)))
    r = _update(hot, floors_path, "session-A")
    assert "refuse" in r.stdout
    assert json.loads(floors_path.read_text())["floors"]["q"]["floor"] == 1.0

    # first steal-flat observation: candidate only
    a = tmp_path / "a.json"
    a.write_text(json.dumps(_rec(0.9, 0.85, steal=0.1, steal_max=0.2)))
    r = _update(a, floors_path, "session-A")
    assert "candidate" in r.stdout
    doc = json.loads(floors_path.read_text())["floors"]["q"]
    assert doc["floor"] == 1.0 and doc["candidate"]["value"] == 0.85

    # same source again, even lower: candidate keeps the LARGER value
    a2 = tmp_path / "a2.json"
    a2.write_text(json.dumps(_rec(0.9, 0.7, steal=0.1, steal_max=0.2)))
    _update(a2, floors_path, "session-A")
    doc = json.loads(floors_path.read_text())["floors"]["q"]
    assert doc["floor"] == 1.0 and doc["candidate"]["value"] == 0.85

    # second INDEPENDENT steal-flat session: floor -> max(0.85, 0.9)
    b = tmp_path / "b.json"
    b.write_text(json.dumps(_rec(0.95, 0.9, steal=0.05, steal_max=0.1)))
    r = _update(b, floors_path, "session-B")
    assert "LOWERED" in r.stdout
    doc = json.loads(floors_path.read_text())["floors"]["q"]
    assert doc["floor"] == 0.9 and "candidate" not in doc
    assert "session-A" in doc["provenance"]
    assert "session-B" in doc["provenance"]


def test_committed_floors_match_baseline_bench_set():
    """floors.json must cover exactly the pinned bench.py order —
    a bench query without a floor would fail the gate at verify time;
    catching the drift here is cheaper."""
    floors = json.loads((ROOT / "tools" / "floors.json").read_text())
    bench_src = (ROOT / "bench.py").read_text()
    import re
    m = re.search(r"order = \[(.*?)\]", bench_src, re.S)
    order = re.findall(r'"(\w+)"', m.group(1))
    assert set(floors["floors"]) == set(order)

"""Driver-window rotation derivation (VERDICT r8 #6): the window is
tool-generated from CORRECTNESS_r*.json staleness, and the committed
``_DRIVER_WINDOW_FIRST`` must satisfy the standing policy's hard
invariants against the artifacts actually in the repo.  Pure metadata
— no Spark session."""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from audit_driver_window import WINDOW_SIZE, propose_window  # noqa: E402

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    _DRIVER_WINDOW_FIRST,
)


def _hashed_union() -> set[str]:
    hashed: set[str] = set()
    for path in glob.glob(str(ROOT / "CORRECTNESS_r[0-9]*.json")):
        hashed |= set(json.load(open(path)))
    return hashed


def test_propose_window_shape_and_priorities():
    changed = ["flagship_weather_join"]  # arbitrary known entry
    window = propose_window(changed)
    assert len(window) == WINDOW_SIZE
    assert len(set(window)) == WINDOW_SIZE
    assert set(window) <= set(REGISTRY)
    # priority 1: changed entries lead
    assert window[0] == "flagship_weather_join"
    # priority 2: every never-hashed entry precedes every stale
    # re-entry (the backlog is small enough to fit, so it must all be
    # in the window before any previously-hashed filler)
    hashed = _hashed_union()
    never = [n for n in REGISTRY
             if n not in hashed and n not in changed]
    if never and len(never) + len(changed) <= WINDOW_SIZE:
        assert set(never) <= set(window)
        last_never = max(window.index(n) for n in never)
        stale = [n for n in window
                 if n in hashed and n not in changed]
        if stale:
            assert min(window.index(n) for n in stale) > last_never


def test_propose_rejects_unknown_changed_name():
    import pytest
    with pytest.raises(SystemExit):
        propose_window(["not_a_registry_entry"])


def test_committed_window_clears_the_hash_backlog():
    """The r9 commitment: window union r1..r9 = the whole registry —
    every entry not yet hashed by the driver must sit in the CURRENT
    window (this invariant holds for any round whose backlog fits in
    50; when it stops fitting, the tool fills oldest-first and this
    test's precondition goes false)."""
    hashed = _hashed_union()
    never = {n for n in REGISTRY if n not in hashed}
    if len(never) <= WINDOW_SIZE:
        assert never <= set(_DRIVER_WINDOW_FIRST), sorted(
            never - set(_DRIVER_WINDOW_FIRST))


def test_window_is_registry_prefix():
    """The reorder actually happened: the driver hashes the FIRST 50
    registry entries, so _DRIVER_WINDOW_FIRST must be the literal
    prefix of iteration order."""
    assert list(REGISTRY)[:len(_DRIVER_WINDOW_FIRST)] == list(
        _DRIVER_WINDOW_FIRST)

"""make_scale_lake.py --dedup-fair invariants (pure DuckDB, no Spark).

The fair mode exists so a dedup linearity ratio is meaningful: the
default per-doc ` r{i}` suffix makes every replica a near-twin of the
source doc, so duplicate-cluster WIDTH grows with the replica count and
verified pair counts grow quadratically by construction (BASELINE.md
round-9 second-decade section).  --dedup-fair instead suffixes EVERY
token with ``␞i`` (a reserved sentinel no source token contains, so
the per-replica images are provably disjoint even for corpora whose
tokens end in ``_N`` — ADVICE r9) — a bijective token mapping per
replica — so:

1. intra-replica token-set Jaccard is exactly preserved (pair count
   scales exactly linearly with replicas), and
2. cross-replica token/shingle overlap is ZERO (no generator-made
   clusters at all).

Both properties are asserted here by brute force on the sf0.001 lake;
the default mode's behavior is pinned too so the established sf1/sf10
artifacts stay reproducible.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"

# brute-force token-set jaccard >= 0.4 pairs within a lang block —
# the same (block, threshold) contract as dedup_token_jaccard
_PAIRS = r"""
WITH tk AS (SELECT doc_id, lang,
                   list_distinct(regexp_split_to_array(trim(text), '\s+'))
                       AS t
            FROM {view})
SELECT count(*) FROM tk a JOIN tk b
    ON a.lang = b.lang AND a.doc_id < b.doc_id {extra}
WHERE len(list_intersect(a.t, b.t))::DOUBLE
      / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.4
"""


def _build(out: str, reps: int, fair: bool) -> None:
    cmd = [sys.executable, "tools/make_scale_lake.py", "--src", SRC,
           "--out", out, "--reps", str(reps)]
    if fair:
        cmd.append("--dedup-fair")
    subprocess.run(cmd, check=True, cwd=ROOT, capture_output=True)


@pytest.fixture(scope="module")
def fair_lake(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "fair")
    _build(out, reps=3, fair=True)
    return out


def test_fair_lake_pair_count_exactly_linear(fair_lake):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW s AS SELECT * FROM '{SRC}/documents.parquet'")
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM '{fair_lake}/documents.parquet'")
    src_pairs = con.execute(_PAIRS.format(view="s", extra="")).fetchone()[0]
    fair_pairs = con.execute(_PAIRS.format(view="d", extra="")).fetchone()[0]
    assert src_pairs > 0                       # the lake has real near-dups
    assert fair_pairs == 3 * src_pairs         # bijection => exact linearity


def test_fair_lake_zero_cross_replica_overlap(fair_lake):
    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM '{fair_lake}/documents.parquet'")
    cross = con.execute(_PAIRS.format(
        view="d",
        extra=f"AND a.doc_id // {n_src} <> b.doc_id // {n_src}",
    )).fetchone()[0]
    assert cross == 0
    # stronger: not a single shared token across replicas 0 and 1
    shared = con.execute(f"""
        WITH tk AS (SELECT doc_id // {n_src} AS rep,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS tok
                    FROM d WHERE doc_id // {n_src} IN (0, 1))
        SELECT count(*) FROM (
            SELECT tok FROM tk GROUP BY tok
            HAVING count(DISTINCT rep) > 1)
    """).fetchone()[0]
    assert shared == 0


def test_fair_lake_n_chars_matches_rewritten_text(fair_lake):
    con = duckdb.connect()
    bad = con.execute(
        f"SELECT count(*) FROM '{fair_lake}/documents.parquet' "
        f"WHERE n_chars <> length(text)").fetchone()[0]
    assert bad == 0


def test_meta_records_build_mode(fair_lake):
    """ADVICE r9: the lake carries its own build provenance, written
    LAST (it doubles as the completed-build marker)."""
    import json
    meta = json.load(open(os.path.join(fair_lake, "_meta.json")))
    assert meta["dedup_fair"] is True
    assert meta["reps"] == 3
    assert os.path.normpath(meta["src"]) == os.path.normpath(SRC)


def test_ensure_lake_rebuilds_on_mode_mismatch(tmp_path):
    """bench_scale.ensure_lake must refuse to bench the wrong lake: a
    classic-mode lake requested as dedup-fair is rebuilt (and the
    returned metadata — the artifact's label — reflects the rebuild)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from bench_scale import ensure_lake

    out = str(tmp_path / "lake")
    meta = ensure_lake(out, SRC, 2, dedup_fair=False)
    assert meta["dedup_fair"] is False
    # same parameters: reuse, no rebuild (meta returned verbatim)
    again = ensure_lake(out, SRC, 2, dedup_fair=False)
    assert again == meta
    # mode flip: must rebuild as fair and say so in the metadata
    flipped = ensure_lake(out, SRC, 2, dedup_fair=True)
    assert flipped["dedup_fair"] is True
    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    # and the documents really are fair-mode now (sentinel suffix)
    suffixed = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet' "
        f"WHERE doc_id >= {n_src} AND text LIKE '%␞1%'").fetchone()[0]
    assert suffixed > 0


def test_default_mode_unchanged(tmp_path):
    out = str(tmp_path / "classic")
    _build(out, reps=2, fair=False)
    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    # replica 1 keeps the documented per-doc near-twin suffix
    not_suffixed = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet' "
        f"WHERE doc_id >= {n_src} AND text NOT LIKE '% r1'").fetchone()[0]
    assert not_suffixed == 0

"""Every oracle-backed queries() entry hash-matches DuckDB at sf0.001
(the driver runs the same comparison at sf0.01 — this is the fast
in-repo replica of that gate, SURVEY.md §5.2)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (
    REGISTRY,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.tables import (
    TPCH_TABLES,
)

from .conftest import SF_SMALL

ORACLE_NAMES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else (0.0 if round(v, 9) == 0
                                                 else round(v, 9))
            if isinstance(v, bytes):
                v = v.hex()
            vals.append((v is None, type(v).__name__, repr(v)))
        out.append(tuple(vals))
    out.sort()
    return out


# The builder-side fetchall() path masks pandas-bridge dtype drift
# (HUGEINT -> Python int), which is exactly how the three r7 driver-hash
# failures shipped (VERDICT r7 "What's wrong #1" / next-round #2).  Lint
# every oracle's *bound* output schema — binding is free, no execution —
# so the seam fails locally before an entry ever reaches a driver
# window.  The drifting-type list lives in tools/check_correctness.py
# (single source of truth shared with the checker's own lint).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))
from check_correctness import PANDAS_DRIFT_TYPES  # noqa: E402


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_output_dtypes_pandas_safe(duck, name):
    rel = duck.sql(entrymod.oracle_sql()[name])
    drifty = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
              if str(t).startswith(PANDAS_DRIFT_TYPES)]
    assert not drifty, (
        f"oracle '{name}' emits pandas-drifting DuckDB types {drifty}; "
        "CAST the offending expression (e.g. CAST(SUM(x) AS BIGINT)) so "
        "the driver's .df() bridge preserves the value dtype")


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_SMALL)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, spark_cols) == _normalize(duck_rows, duck_cols)


def test_fix_rounds_guards():
    """_fix_rounds: two-arg rewrite, quoted literals untouched,
    one-arg form raises instead of mis-slicing (ADVICE r1)."""
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (
        _fix_rounds,
    )
    assert _fix_rounds("round(x, 2)") == \
        "CAST(CAST(x AS DECIMAL(38,2)) AS DOUBLE)"
    assert _fix_rounds("SELECT 'a round(x) b' AS s FROM t") == \
        "SELECT 'a round(x) b' AS s FROM t"
    with pytest.raises(ValueError, match="one-argument"):
        _fix_rounds("SELECT round(x) FROM t")

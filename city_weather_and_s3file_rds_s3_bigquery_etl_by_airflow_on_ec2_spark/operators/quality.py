"""Data-quality check operators (SURVEY.md §2.3 P5 generalized).

The reference's only runtime check is "raise if the XCom payload is
empty" (codes/weather_etl_pipeline.py:196-197). The engine generalizes
that into assertion-style checks that fail *fast* (deliberately unlike
the reference's silent try/except task, §2.12 O6). Each check runs as
one cheap aggregate action (count/limit on the distributed plan — no
collect of data rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataQualityError(ValueError):
    pass


def expect_nonempty(df: DataFrame, what: str = "input") -> DataFrame:
    """P5 — the reference's empty-payload guard, Spark-side. Uses
    ``limit(1)`` so it never scans more than one partition's head."""
    if df.limit(1).isEmpty():
        raise DataQualityError(f"{what}: expected at least one row")
    return df


def expect_unique_key(df: DataFrame, key_cols: list[str]) -> DataFrame:
    dup = (df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
           .where(F.col("n") > 1).limit(1).collect())
    if dup:
        raise DataQualityError(
            f"duplicate key {dict(zip(key_cols, dup[0][:-1]))} "
            f"(x{dup[0]['n']})")
    return df


def expect_no_nulls(df: DataFrame, cols: list[str]) -> DataFrame:
    cond = None
    for c in cols:
        p = F.col(c).isNull()
        cond = p if cond is None else (cond | p)
    if not df.where(cond).limit(1).isEmpty():
        raise DataQualityError(f"null values in {cols}")
    return df


def expect_values_in(df: DataFrame, col: str, allowed: list) -> DataFrame:
    bad = df.where(~F.col(col).isin(allowed) | F.col(col).isNull()) \
            .limit(1).collect()
    if bad:
        raise DataQualityError(f"{col}: unexpected value {bad[0][col]!r}")
    return df


def observed_counts(df: DataFrame, **metrics: "F.Column"):
    """Zero-cost pipeline observability: attach named aggregate
    metrics (``df.observe``) that are computed DURING the job's normal
    pass — unlike the expect_* guards above, NO extra action or scan
    is spent.  Returns ``(observed_df, observation)``; after the
    caller runs ONE action on observed_df, ``observation.get`` yields
    the metric dict.

    This is the right tool for per-batch row counts / null rates /
    checksum accumulators on a 100-TB run: each expect_* guard costs
    one extra (cheap) job; an observation costs nothing.  Guards FAIL
    the run; observations record — pair them (observe everything,
    guard only the invariants)."""
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, *[c.alias(a) for a, c in metrics.items()]), obs

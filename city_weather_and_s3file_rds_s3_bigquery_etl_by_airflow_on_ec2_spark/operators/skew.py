"""Skew-mitigation operators.

AQE's skew-join handling covers joins (session.py enables it); for
aggregations over pathologically hot keys the classic fix is salted
two-phase aggregation: partial-aggregate on (key, salt) — spreading a
hot key over ``salt_buckets`` reducers — then final-aggregate on key.
Results are exactly equal to the direct aggregate for decomposable
aggregates (sum/count/min/max), which is what the registry's oracle
check proves.

Spark already performs map-side partial aggregation, which handles
*moderate* skew; explicit salting matters when one key's partials
still overwhelm a single reducer (billions of rows per key at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 32,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase sum/count per key. ``salt_source`` defaults to a hash
    of the value column — deterministic (no rand(), so re-runs and
    retried tasks agree) while still spreading a hot key."""
    salt = (salt_source if salt_source is not None
            else F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets)))
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*key_cols, _SALT)
        .agg(F.sum(value_col).alias("__psum"),
             F.count(F.lit(1)).alias("__pcnt"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("__psum").alias(f"sum_{value_col}"),
             F.sum("__pcnt").alias("n_rows"))
    )

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


def hot_slice_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_hot: int = 10,
) -> DataFrame:
    """Skew-resistant INNER equi-join: broadcast the hot slice, shuffle
    the rest.

    The remedy that the ``events_hot_keys`` census diagnoses: when a
    handful of join-key values hold a disproportionate share of the
    fact table, a plain shuffle join lands each hot key on ONE reducer
    (AQE's skew split helps the sort-merge side but still shuffles the
    hot rows).  This operator splits the fact on the ``n_hot``
    heaviest keys:

    - **hot slice** — joined against ONLY the dim rows carrying hot
      keys (≤ ``n_hot`` rows, broadcast), so the heaviest fact rows
      are joined map-side and NEVER shuffle;
    - **cold remainder** — an ordinary shuffle join whose key
      distribution is now uniform enough for AQE.

    The union is exactly the plain inner join (hot/cold partition the
    fact's key space; inner joins drop NULL keys on both paths), which
    is what the registry oracle proves.  The only driver state is the
    ``n_hot``-row hot-key census (deterministic: ordered by count then
    key), collected once — at 100 TB the census is a map-side-combined
    (key, count) shuffle, metadata-scale.

    INNER-only by design: the cold filter ``NOT key IN hot`` drops
    NULL-keyed fact rows, which an outer join would need to preserve.
    """
    # NULL keys never match an inner join, and a NULL inside the isin()
    # lists would poison the cold-side NOT-IN filter (NOT(NULL) = NULL
    # drops every unmatched row) — keep them out of the census.
    census = (
        fact.where(F.col(fact_key).isNotNull())
        .groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), fact_key)
        .limit(n_hot)
    )
    hot_keys = [r[0] for r in census.select(fact_key).collect()]
    hot_fact = fact.where(F.col(fact_key).isin(hot_keys))
    hot_dim = dim.where(F.col(dim_key).isin(hot_keys))
    cold_fact = fact.where(~F.col(fact_key).isin(hot_keys))
    hot = hot_fact.join(F.broadcast(hot_dim),
                        hot_fact[fact_key] == hot_dim[dim_key], "inner")
    cold = cold_fact.join(dim, cold_fact[fact_key] == dim[dim_key], "inner")
    return hot.unionByName(cold)

"""Physical layout tools: partitioned writes (partition pruning) and
bucketed tables (shuffle-free co-located joins).

These are the two levers that matter most at 100 TB:

- ``write_partitioned`` — hive-style directory partitioning; any query
  filtering on the partition column prunes at the *file listing* level
  (shows as ``PartitionFilters`` in the scan node) before a byte is
  read.
- ``write_bucketed`` / ``bucketed_join_ready`` — pre-shuffle both join
  sides into the same bucketing; later equi-joins on the bucket key
  skip the exchange entirely (SortMergeJoin with zero Exchange). Spark
  bucketing requires the session catalog (`saveAsTable`), so these
  helpers manage a local spark_warehouse for tests and a real
  metastore in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str]) -> None:
    """Partitioned parquet write. Choose partition columns with
    bounded cardinality (date, region — never a high-NDV key: each
    value is a directory)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def add_date_partition(df: DataFrame, ts_col: str,
                       col_name: str = "event_date") -> DataFrame:
    """Derive the canonical daily partition column from an event-time
    timestamp."""
    return df.withColumn(col_name, F.to_date(F.col(ts_col)))


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 16,
                   sort_cols: list[str] | None = None) -> None:
    """Materialize a bucketed (and optionally sort-clustered) table in
    the session catalog. Joins/aggregations on ``bucket_cols`` between
    tables bucketed the same way run without any shuffle."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key — the
    plan contains no Exchange on either side (asserted in tests).

    The merge hint pins SortMergeJoin: at test scale Catalyst would
    otherwise broadcast the small side, and at 100 TB — where neither
    side broadcasts — SMJ over co-bucketed scans is exactly the
    shuffle-free plan this layout exists for."""
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table), on=on, how=how))

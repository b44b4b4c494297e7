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


# ------------------------------------------------------------- Z-order —
# Multi-dimensional clustering: directory partitioning prunes on ONE
# column and bucketing co-locates ONE key; a Z-(Morton-)order sort
# clusters files on SEVERAL columns at once, so 2-D selective queries
# (user range x day range) skip files via parquet min/max row-group
# stats on BOTH dimensions.  Same mechanism as Delta OPTIMIZE ZORDER
# BY, expressed with plain Spark: scale each column to a fixed-width
# integer grid, interleave the bits, repartitionByRange + sort on the
# Z value, write.

Z_BITS = 16


def zorder_scale(col: "F.Column", cmin: int, cmax: int,
                 bits: int = Z_BITS) -> "F.Column":
    """Scale an integer column with known [cmin, cmax] onto the
    [0, 2^bits) grid — pure integer arithmetic (no float rounding, so
    the mapping is engine-exact and oracle-checkable)."""
    span = max(cmax - cmin, 1)
    # floor() (not a truncating cast) on both engines: Spark's
    # double->long cast truncates while DuckDB's rounds, so the oracle
    # mirrors this exact floor(a*k/span) spelling.  The IEEE double
    # multiply/divide is bit-identical cross-engine for these
    # magnitudes (< 2^53).
    return F.floor((col - F.lit(cmin)).cast("long")
                   * F.lit((1 << bits) - 1) / F.lit(span)).cast("long")


def zorder_value(x: "F.Column", y: "F.Column",
                 bits: int = Z_BITS) -> "F.Column":
    """Interleave the low ``bits`` of two grid coordinates into the
    Morton code: bit i of x lands at 2i, bit i of y at 2i+1.
    Expression-only (64 shift/mask terms fused by codegen; constant
    plan size)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.call_function(
            "shiftleft", F.shiftright(x, i).bitwiseAND(F.lit(1)),
            F.lit(2 * i))
        ybit = F.call_function(
            "shiftleft", F.shiftright(y, i).bitwiseAND(F.lit(1)),
            F.lit(2 * i + 1))
        z = z.bitwiseOR(xbit).bitwiseOR(ybit)
    return z


def write_zordered(df: DataFrame, path: str, col_x: str, col_y: str,
                   num_files: int = 8, bits: int = Z_BITS) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the
    Z-order of (col_x, col_y).  One metadata-scale agg collects the
    4 min/max bounds; repartitionByRange on the Z value range-splits
    the curve, and the within-partition sort tightens per-row-group
    min/max stats.  Readers need no special support: parquet stat
    pruning on either column simply skips most files."""
    b = df.agg(F.min(col_x), F.max(col_x),
               F.min(col_y), F.max(col_y)).first()
    z = zorder_value(
        zorder_scale(F.col(col_x), b[0], b[1], bits),
        zorder_scale(F.col(col_y), b[2], b[3], bits), bits)
    (df.withColumn("__z", z)
       .repartitionByRange(num_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


# ------------------------------------------------------- compaction —

def compact_files(spark: SparkSession, path: str,
                  target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` balanced files and swap
    it into place.  Returns the new file count.

    Why it matters at 100 TB: streaming ingests and fine-grained
    partition writes leave thousands of KB-scale files per directory;
    every reader then pays per-file open/footer costs and the driver
    pays listing time.  Periodic compaction to ~128 MB files (the
    HDFS-block-sized sweet spot) is standard table maintenance —
    this is the plain-parquet form of Delta's OPTIMIZE.

    Swap protocol: write to ``<path>__compact_tmp``, then rename the
    old dir aside, the new dir in, and delete the old — the window
    where readers can see a missing dir is two metadata renames (a
    catalog/Delta-backed table would make this atomic; plain parquet
    cannot).  All filesystem ops go through the Hadoop FS API so the
    operator works on object stores, not just local disk."""
    import math

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    if not fs.rename(jpath, jold):
        raise IOError(f"compact_files: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        fs.rename(jold, jpath)  # roll back
        raise IOError(f"compact_files: could not swap in {tmp}")
    fs.delete(jold, True)
    return n_files

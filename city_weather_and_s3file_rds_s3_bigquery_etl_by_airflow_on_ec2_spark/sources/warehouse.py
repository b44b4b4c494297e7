"""Warehouse sink (SURVEY.md §2.2 K4) and idempotent writes (§2.12 O7).

The reference appends to BigQuery via a blocking load job with
name-based schema matching. The engine's canonical offline stand-in is
a partitioned-parquet warehouse table; when the spark-bigquery
connector jar is present, ``bigquery_append_writer`` produces the real
thing (import-gated — the jar is not in this container).

O7 (idempotency): the reference's re-runs duplicate rows. The engine
default is ``merge_append`` — an anti-join on the business key before
appending, so replays are no-ops. The reference-faithful blind append
remains available as ``append``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API so it holds
    for every warehouse URI Spark can write (s3a://, hdfs://, dbfs:/,
    file:/, bare local paths) — ``os.path.exists`` is local-FS-only
    and would silently report False for object stores, degrading
    ``merge_append`` into a blind append on replay."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def append(df: DataFrame, path: str, align_to_existing: bool = True,
           partition_by: list[str] | None = None) -> None:
    """K4 append semantics with *name-based* column matching: if the
    warehouse table exists, reorder/select columns by name (the
    BigQuery load-job behavior the reference relies on — its DDL order
    differs from its DataFrame order)."""
    spark = df.sparkSession
    if align_to_existing and table_exists(spark, path):
        existing = spark.read.parquet(path).schema
        df = df.select(*[F.col(f.name) for f in existing.fields])
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def merge_append(df: DataFrame, path: str, key_cols: list[str],
                 partition_by: list[str] | None = None) -> int:
    """Idempotent append: drop incoming rows whose key already exists
    (left-anti join against the current table), then append. Returns
    the number of rows actually written.

    Scale note: the anti-join shuffles only the key columns of the
    existing table; with a partitioned warehouse the read prunes to
    the touched partitions. (With Delta/Iceberg on the classpath this
    becomes a real MERGE INTO; parquet posture keeps the same API.)"""
    spark = df.sparkSession
    incoming = df.dropDuplicates(key_cols)
    if table_exists(spark, path):
        existing_keys = spark.read.parquet(path).select(*key_cols)
        incoming = incoming.join(existing_keys, on=key_cols, how="left_anti")
    n = incoming.count()
    if n:
        append(incoming, path, partition_by=partition_by)
    return n


def overwrite(df: DataFrame, path: str,
              partition_by: list[str] | None = None) -> None:
    """K5 — truncate-and-reload."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def bigquery_append_writer(df: DataFrame, table: str):
    """Real K4 when the public spark-bigquery-connector is on the
    classpath; raises a clear error otherwise.

    Returns an *un-executed* ``DataFrameWriter`` (laziness is
    intentional — the caller decides when to ``.save()``), so the
    missing-jar failure cannot be left to the writer builder (which
    never raises).  The classpath is probed explicitly up front."""
    jvm = df.sparkSession._jvm
    try:
        jvm.java.lang.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider")
    except Exception as e:
        raise RuntimeError(
            "spark-bigquery-connector not on the classpath; add "
            "spark.jars.packages=com.google.cloud.spark:spark-bigquery-"
            "with-dependencies_2.13:<version> or use warehouse.append()"
        ) from e
    return (df.write.format("bigquery")
            .option("table", table)
            .option("writeMethod", "direct")
            .mode("append"))

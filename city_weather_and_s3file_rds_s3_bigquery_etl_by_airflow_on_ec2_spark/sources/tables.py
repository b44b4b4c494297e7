"""Canonical lake tables (driver testdata, TESTDATA.md).

``load_tables``/``register_views`` are the single entry point every
query plan uses to reach the parquet lake, so scan behavior (pushdown,
pruning, partition sizing) is controlled in one place.

Scale: `spark.read.parquet` is the vectorized Tungsten scan — filters
and column pruning reach the file level via Catalyst automatically, so
queries built on these views keep `PushedFilters`/`ReadSchema` tight at
100 TB without per-query work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables it is always safe (and right) to broadcast in
# joins against fact tables — the reference's city_look_up pattern
# (SURVEY.md §2.4 J1) generalized to the TPC-H star schema.
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _normalize_types(df: DataFrame) -> DataFrame:
    """Undo reader workarounds: the events table's TIMESTAMP(NANOS)
    column arrives as long nanos (spark.sql.legacy.parquet.nanosAsLong);
    convert to a real timestamp truncated to micros — the same
    truncation DuckDB applies reading the file, so both engines see
    identical instants."""
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and isinstance(f.dataType, T.TimestampNTZType):
            # lakes rewritten by other engines (e.g. the DuckDB-built
            # perf scale lake) carry NTZ timestamps; session tz is
            # pinned UTC so the cast to instant semantics is exact
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Public form of the ``ts`` normalization for STREAMING readers
    (``_normalize_types`` covers batch reads): whatever physical type
    the lake writer used for event time — TIMESTAMP(NANOS) read as
    long under ``nanosAsLong``, or micros-NTZ (the r5 driver lakes) —
    becomes a session-UTC TimestampType, which ``withWatermark``
    requires (it rejects NTZ outright)."""
    return _normalize_types(df)


# Schema memo (r12, guide §5): schema-less `spark.read.parquet` runs a
# footer-sampling inference JOB at every plan build — one per table per
# bench pass (join_5way_star paid five).  A real deployment reads table
# schemas from the catalog/metastore, not from file footers per query;
# this memo is that catalog.  METADATA ONLY — never rows, never plans,
# never results: every execution still scans the parquet.  Keyed on
# (realpath, mtime, size) — plus, for directory tables, the entry
# count and newest child (mtime, size) (ADVICE r12 #1) — so a
# rewritten lake under the same path re-infers.
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..session import ensure_session_confs

    ensure_session_confs(spark)  # driver sessions lack engine confs
    path = table_path(sf_dir, name)
    if not os.path.exists(path):
        # schema-less read so Spark surfaces its own missing-path error
        return _normalize_types(spark.read.parquet(path))
    schema = read_parquet_schema(spark, path)
    return _normalize_types(spark.read.schema(schema).parquet(path))


def _schema_cache_key(path: str) -> tuple | None:
    """Cache key for the schema memo (ADVICE r12 #1 hardening): for a
    REGULAR FILE, (realpath, mtime, size) is sound — rewriting the file
    bumps mtime/size.  For a DIRECTORY-style parquet table, a part-file
    rewritten in place does not necessarily bump the directory's own
    mtime/size, so the key additionally folds in the count and the
    newest (mtime, size) of the directory's entries — an in-place
    part-file rewrite then changes the key and forces re-inference.
    Unstat-able paths return None (never cached)."""
    try:
        st = os.stat(path)
        real = os.path.realpath(path)
        if not os.path.isdir(path):
            return (real, st.st_mtime, st.st_size)
        newest = (0.0, 0)
        n = 0
        with os.scandir(path) as entries:
            for e in entries:
                es = e.stat()
                n += 1
                newest = max(newest, (es.st_mtime, es.st_size))
        return (real, st.st_mtime, st.st_size, n, newest)
    except OSError:
        return None


def read_parquet_schema(spark: SparkSession, path: str) -> T.StructType:
    """Raw (pre-normalization) schema of a lake parquet path, memoized
    in the same metadata catalog as ``read_parquet_table`` — streaming
    readers must pass an explicit schema, and schema-less inference
    costs one footer-sampling job per call (r12, guide §5)."""
    key = _schema_cache_key(path)
    if key is not None and key in _SCHEMA_CACHE:
        return _SCHEMA_CACHE[key]
    schema = spark.read.parquet(path).schema
    if key is not None:
        _SCHEMA_CACHE[key] = schema
    return schema


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    return {name: read_parquet_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Register each lake table as a temp view so the SQL entry point
    (SURVEY.md §3.3) resolves the same relations as the DataFrame DSL."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

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


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


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

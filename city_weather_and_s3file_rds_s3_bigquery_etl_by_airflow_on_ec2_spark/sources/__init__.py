"""Ingest layer (SURVEY.md §2.1 S1–S6).

The reference touches four storage systems (OpenWeatherMap HTTP, S3
CSV, RDS Postgres, BigQuery — SURVEY.md §1.4). In the Spark-native
engine the parquet lake is canonical; CSV/JDBC/HTTP are thin adapters
that all land in DataFrames, after which every downstream operator is
storage-agnostic.
"""

from .files import read_csv_positional, write_single_csv
from .tables import TPCH_TABLES, load_tables, read_parquet_table, register_views

__all__ = [
    "TPCH_TABLES",
    "load_tables",
    "register_views",
    "read_csv_positional",
    "read_parquet_table",
    "write_single_csv",
]

"""PySpark-native analytics engine with the query/data-processing
capabilities of vaxdata22/City-Weather-and-S3File-RDS-S3-BigQuery-ETL-by-Airflow-on-EC2
(reference surveyed in SURVEY.md), rebuilt Spark-first.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the public reference repo, and published papers. The
reference's Airflow/pandas/psycopg2 task pipeline is re-expressed as a
single Spark logical plan (SURVEY.md §3.1): DataFrame lineage replaces
XCom edges, Catalyst replaces Postgres as the join engine, and the
parquet lake replaces S3-CSV staging.

Subpackages
-----------
``session``    SparkSession factory (UTC tz, AQE, Arrow — SURVEY.md §4.2)
``sources``    file/JDBC/HTTP ingest (SURVEY.md §2.1: S1-S6)
``functions``  scalar column-expression layer (SURVEY.md §2.9: F1-F5)
``operators``  joins/dedup/similarity/text/multimodal ops (§2.4, §2.13)
``plans``      assembled query plans incl. the reference pipeline (§3)
``streaming``  Structured Streaming posture (§2.10)
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

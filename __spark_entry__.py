"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the
``city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark``
package; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans import (  # noqa: E402
    registry as _registry,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.relational import (  # noqa: E402
    flagship_weather_join,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's end-to-end shape (SURVEY.md §3.1): fact scan →
    filter → broadcast-dim join → projection with arithmetic + epoch
    timestamp conversion.
    """
    return flagship_weather_join(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted for
    non-SQL-expressible probabilistic ops → rows-only check)."""
    return _registry.oracle_sql()

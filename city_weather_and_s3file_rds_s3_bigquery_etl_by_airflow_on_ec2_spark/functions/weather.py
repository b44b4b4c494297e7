"""Reference scalar functions F1–F3 (SURVEY.md §2.9) as pure column
expressions — JVM-side, whole-stage-codegen'd, no UDFs.

Parity notes pinned here (and asserted in tests):
- F1 rounding: reference uses Python ``round`` (banker's); ``F.round``
  is HALF_UP. At 3 decimals on weather magnitudes the difference is
  sub-observable; the engine standardizes on HALF_UP (matches DuckDB).
- F2 semantics: reference stores *local wall clock as naive TIMESTAMP*
  by adding the UTC-offset seconds to the epoch before conversion
  (weather_etl_pipeline.py:70-72). Reproduced with
  ``timestamp_seconds(dt + tz_offset)`` under a UTC session timezone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KELVIN_ZERO_C = 273.15


def kelvin_to_fahrenheit(temp_k: Column | str, scale: int = 3) -> Column:
    """F1 — ``round((K − 273.15) × 9/5 + 32, 3)``
    (reference codes/weather_etl_pipeline.py:47-48)."""
    col = F.col(temp_k) if isinstance(temp_k, str) else temp_k
    return F.round((col - F.lit(KELVIN_ZERO_C)) * F.lit(9.0 / 5.0) + F.lit(32.0), scale)


def local_timestamp(epoch_s: Column | str, tz_offset_s: Column | str) -> Column:
    """F2 — epoch seconds + city UTC-offset → naive local wall-clock
    timestamp (reference codes/weather_etl_pipeline.py:70-72). Requires
    ``spark.sql.session.timeZone=UTC`` (set by session.get_spark)."""
    e = F.col(epoch_s) if isinstance(epoch_s, str) else epoch_s
    o = F.col(tz_offset_s) if isinstance(tz_offset_s, str) else tz_offset_s
    return F.timestamp_seconds(e + o)


def to_timestamp_coerce(col: Column | str) -> Column:
    """F3 — timestamp parse with NULL on failure, the semantics of the
    reference's ``pd.to_datetime(errors="coerce")``
    (codes/weather_etl_pipeline.py:241-243). Under Spark 4's default
    ANSI mode ``to_timestamp`` raises on malformed input, so the
    coercing variant is ``try_to_timestamp``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c)

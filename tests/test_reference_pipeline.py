"""Reference-fidelity tests (SURVEY.md §5.2): the golden single-row
end-to-end check from FIXTURES.md A4, plus the behavioral properties
the reference exhibits (join drops non-matching cities, duplicate
multiplication under re-run, BOM/positional CSV ingest, null-coercing
timestamp parse)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.functions.weather import (
    to_timestamp_coerce,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.reference_pipeline import (
    FINAL_COLUMNS,
    GOLDEN_OWM_PAYLOAD,
    run_reference_pipeline,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.files import (
    read_csv_positional,
)


def test_golden_row(spark):
    """FIXTURES.md A4: Houston 2025-03-17 run, exact 15-column row."""
    rows = run_reference_pipeline(spark).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert list(rows[0].asDict()) == FINAL_COLUMNS
    assert r["city"] == "Houston"
    assert r["description"] == "clear sky"
    assert r["temperature_fahrenheit"] == 55.148
    assert r["feels_like_fahrenheit"] == 53.654
    assert r["min_temperature_fahrenheit"] == 50.198
    assert r["max_temperature_fahrenheit"] == 57.11
    assert r["pressure"] == 1024
    assert r["humidity"] == 70
    assert r["wind_speed"] == 0.0
    assert r["time_of_record"] == datetime.datetime(2025, 3, 17, 4, 31, 8)
    assert r["sunrise"] == datetime.datetime(2025, 3, 17, 7, 28, 35)
    assert r["sunset"] == datetime.datetime(2025, 3, 17, 19, 30, 53)
    assert r["state"] == "Texas"
    assert r["census_2020"] == 2304580
    assert r["land_area_sq_mile_2020"] == 640.4


def test_inner_join_drops_unmatched(spark):
    """Chicago/Seattle lookup rows have no weather row → absent."""
    cities = {r.city for r in run_reference_pipeline(spark).collect()}
    assert cities == {"Houston"}


def test_rerun_duplicates_multiply(spark):
    """O7 (SURVEY.md §2.12): the reference's append-only re-runs
    multiply duplicates through the join — 2 identical weather rows ×
    1 lookup row ⇒ 2 output rows."""
    out = run_reference_pipeline(
        spark, [GOLDEN_OWM_PAYLOAD, GOLDEN_OWM_PAYLOAD])
    assert out.count() == 2


def test_csv_positional_rename_with_bom(spark, tmp_path):
    """§1.3: header carries a UTF-8 BOM and case-mismatched name; the
    positional reader lands canonical names regardless."""
    p = tmp_path / "us_cities.csv"
    p.write_bytes(
        "﻿city,state,census_2020,land_Area_sq_mile_2020\r\n"
        "Chicago,Illinois,2746388,227.4\n"
        "Houston,Texas,2304580,640.4\n".encode("utf-8"))
    schema = T.StructType([
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("census_2020", T.LongType()),
        T.StructField("land_area_sq_mile_2020", T.DoubleType()),
    ])
    df = read_csv_positional(spark, str(p), schema)
    assert df.columns == ["city", "state", "census_2020",
                          "land_area_sq_mile_2020"]
    rows = {r.city: r for r in df.collect()}
    assert rows["Houston"].census_2020 == 2304580
    assert rows["Chicago"].land_area_sq_mile_2020 == 227.4


def test_to_timestamp_coerce_null_on_garbage(spark):
    """F3: unparseable → NULL (pandas errors='coerce' semantics)."""
    df = spark.createDataFrame(
        [("2025-03-17 04:31:08",), ("not a time",), (None,)], ["s"])
    vals = [r.t for r in df.select(to_timestamp_coerce("s").alias("t")).collect()]
    assert vals[0] == datetime.datetime(2025, 3, 17, 4, 31, 8)
    assert vals[1] is None and vals[2] is None


def test_flagship_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == ["orderkey", "linenumber", "part_name", "brand",
                          "charge", "local_ship_time"]

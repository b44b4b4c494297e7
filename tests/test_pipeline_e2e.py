"""End-to-end pipeline run (SURVEY.md §3.1) and quality-gate tests."""

from __future__ import annotations

import pytest

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.quality import (
    DataQualityError,
    expect_nonempty,
    expect_unique_key,
    expect_values_in,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.pipeline_run import (
    run_weather_pipeline,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.reference_pipeline import (
    GOLDEN_OWM_PAYLOAD,
)


def fetcher(url: str) -> dict:
    if "down" in url:
        raise ConnectionError("api down")
    return GOLDEN_OWM_PAYLOAD


def test_pipeline_end_to_end(spark, tmp_path):
    res = run_weather_pipeline(
        spark, ["http://api/weather?q=houston"], str(tmp_path), fetcher=fetcher)
    assert res.rows_joined == 1
    assert res.warehouse_rows_written == 1
    csv = open(res.csv_path).read().splitlines()
    assert csv[0].startswith("city,description,temperature_fahrenheit")
    assert csv[1].startswith("Houston,clear sky,55.148,53.654")

    # re-run same day: reference would duplicate (O7); engine no-ops
    res2 = run_weather_pipeline(
        spark, ["http://api/weather?q=houston"], str(tmp_path), fetcher=fetcher)
    assert res2.warehouse_rows_written == 0
    wh = spark.read.parquet(f"{tmp_path}/warehouse/final_weather_data")
    assert wh.count() == 1

    # reference-faithful append mode duplicates, as documented
    res3 = run_weather_pipeline(
        spark, ["http://api/weather?q=houston"], str(tmp_path),
        fetcher=fetcher, idempotent=False, write_csv=False)
    assert spark.read.parquet(
        f"{tmp_path}/warehouse/final_weather_data").count() == 2
    assert res3.rows_joined == 1


def test_pipeline_sensor_failure(spark, tmp_path):
    with pytest.raises(RuntimeError, match="sensor"):
        run_weather_pipeline(spark, ["http://down/x"], str(tmp_path),
                             fetcher=fetcher)


def test_quality_gates(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    assert expect_nonempty(df) is df
    with pytest.raises(DataQualityError, match="at least one row"):
        expect_nonempty(df.where("k > 99"))
    with pytest.raises(DataQualityError, match="duplicate key"):
        expect_unique_key(df, ["k"])
    expect_unique_key(df, ["k", "v"])
    expect_values_in(df, "v", ["a", "b"])
    with pytest.raises(DataQualityError, match="unexpected value"):
        expect_values_in(df, "v", ["a"])


def test_engine_query_runs_registry_operators(spark):
    """Engine.query(name) is the user-facing one-call surface for every
    registry operator; unknown names fail with a pointer to the list."""
    import pytest

    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.engine import (
        Engine,
    )

    from .conftest import SF_SMALL

    eng = Engine(sf_dir=SF_SMALL, spark=spark)
    names = Engine.operators()
    assert len(names) >= 230 and "flagship_weather_join" in names
    out = eng.query("q1_pricing_summary").collect()
    assert len(out) > 0
    with pytest.raises(KeyError, match="operators"):
        eng.query("no_such_operator")

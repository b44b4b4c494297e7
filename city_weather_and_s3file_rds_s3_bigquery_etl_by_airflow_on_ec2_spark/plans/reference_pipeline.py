"""The reference pipeline as ONE Spark logical plan (SURVEY.md §3.1).

The reference moves one OpenWeatherMap JSON document and a 3-row CSV
through Airflow tasks, XCom, Postgres (which computes the join), S3 and
BigQuery. Here the whole dataflow is a single lazy DataFrame lineage:

    owm payload ─ P1 flatten ─ F1/F2 convert ─┐
                                              ├─ J1 inner join on city ─ P2/P3 project
    city lookup CSV ─ S3 positional rename ───┘

Citations: flatten reference codes/weather_etl_pipeline.py:60-73 (P1),
conversions :47-48,:70-72 (F1/F2), join :160-180 (J1), projection
:161-176,:200-216 (P2/P3). Fixture data: FIXTURES.md A1/A2; golden
output row FIXTURES.md A4.

Scale: the weather side generalizes to billions of (city, fetch) rows;
the lookup side is a classic broadcast dimension — the join never
shuffles the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.weather import kelvin_to_fahrenheit, local_timestamp

# --- OWM payload schema (FIXTURES.md A1; reference README.md:299-344) ---

OWM_SCHEMA = T.StructType([
    T.StructField("coord", T.StructType([
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])),
    T.StructField("weather", T.ArrayType(T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("main", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("icon", T.StringType()),
    ]))),
    T.StructField("base", T.StringType()),
    T.StructField("main", T.StructType([
        T.StructField("temp", T.DoubleType()),
        T.StructField("feels_like", T.DoubleType()),
        T.StructField("temp_min", T.DoubleType()),
        T.StructField("temp_max", T.DoubleType()),
        T.StructField("pressure", T.LongType()),
        T.StructField("humidity", T.LongType()),
        T.StructField("sea_level", T.LongType()),
        T.StructField("grnd_level", T.LongType()),
    ])),
    T.StructField("visibility", T.LongType()),
    T.StructField("wind", T.StructType([
        T.StructField("speed", T.DoubleType()),
        T.StructField("deg", T.LongType()),
    ])),
    T.StructField("clouds", T.StructType([T.StructField("all", T.LongType())])),
    T.StructField("dt", T.LongType()),
    T.StructField("sys", T.StructType([
        T.StructField("type", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("country", T.StringType()),
        T.StructField("sunrise", T.LongType()),
        T.StructField("sunset", T.LongType()),
    ])),
    T.StructField("timezone", T.LongType()),
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("cod", T.LongType()),
])

# Golden fixture payload — the 2025-03-17 Houston run the reference
# documents (values from FIXTURES.md A1/A4, i.e. README.md:299-344 +
# the notebook/BigQuery outputs). Used for the reference-fidelity test.
GOLDEN_OWM_PAYLOAD: dict = {
    "coord": {"lon": -95.3633, "lat": 29.7633},
    "weather": [{"id": 800, "main": "Clear", "description": "clear sky",
                 "icon": "01n"}],
    "base": "stations",
    # main.temp values reverse-engineered from the golden Fahrenheit
    # outputs (55.148°F → 286.01 K etc.); pressure 1024 / humidity 70
    # from the golden joined row (FIXTURES.md A4).
    "main": {"temp": 286.01, "feels_like": 285.18, "temp_min": 283.26,
             "temp_max": 287.10, "pressure": 1024, "humidity": 70,
             "sea_level": 1024, "grnd_level": 1022},
    "visibility": 10000,
    "wind": {"speed": 0.0, "deg": 0},
    "clouds": {"all": 0},
    "dt": 1742203868,          # → 2025-03-17 04:31:08 local (UTC-5)
    "sys": {"type": 1, "id": 3695, "country": "US",
            "sunrise": 1742214515, "sunset": 1742257853},
    "timezone": -18000,
    "id": 4699066,
    "name": "Houston",
    "cod": 200,
}

# city_look_up fixture (FIXTURES.md A2; reference codes/us_cities.csv).
CITY_LOOKUP_ROWS = [
    ("Chicago", "Illinois", 2746388, 227.4),
    ("Seattle", "Washington", 737015, 83.8),
    ("Houston", "Texas", 2304580, 640.4),
]

CITY_LOOKUP_SCHEMA = T.StructType([
    T.StructField("city", T.StringType()),
    T.StructField("state", T.StringType()),
    T.StructField("census_2020", T.LongType()),
    T.StructField("land_area_sq_mile_2020", T.DoubleType()),
])

FINAL_COLUMNS = [
    "city", "description", "temperature_fahrenheit", "feels_like_fahrenheit",
    "min_temperature_fahrenheit", "max_temperature_fahrenheit", "pressure",
    "humidity", "wind_speed", "time_of_record", "sunrise", "sunset",
    "state", "census_2020", "land_area_sq_mile_2020",
]


def owm_dataframe(spark: SparkSession, payloads: list[dict]) -> DataFrame:
    """S1 — materialize fetched OWM JSON documents as a DataFrame with
    the explicit nested schema (no inference)."""
    return spark.createDataFrame(payloads, schema=OWM_SCHEMA)


def flatten_weather(raw: DataFrame) -> DataFrame:
    """P1 + F1 + F2 — nested-document flatten and unit/time conversion
    (reference codes/weather_etl_pipeline.py:60-73), as pure column
    expressions over the nested struct/array schema."""
    return raw.select(
        F.col("name").alias("city"),
        F.col("weather")[0]["description"].alias("description"),
        kelvin_to_fahrenheit(F.col("main.temp")).alias("temperature_fahrenheit"),
        kelvin_to_fahrenheit(F.col("main.feels_like")).alias("feels_like_fahrenheit"),
        kelvin_to_fahrenheit(F.col("main.temp_min")).alias("min_temperature_fahrenheit"),
        kelvin_to_fahrenheit(F.col("main.temp_max")).alias("max_temperature_fahrenheit"),
        F.col("main.pressure").alias("pressure"),
        F.col("main.humidity").alias("humidity"),
        F.col("wind.speed").alias("wind_speed"),
        local_timestamp(F.col("dt"), F.col("timezone")).alias("time_of_record"),
        local_timestamp(F.col("sys.sunrise"), F.col("timezone")).alias("sunrise"),
        local_timestamp(F.col("sys.sunset"), F.col("timezone")).alias("sunset"),
    )


def city_lookup(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CITY_LOOKUP_ROWS, schema=CITY_LOOKUP_SCHEMA)


def join_weather_lookup(weather: DataFrame, lookup: DataFrame) -> DataFrame:
    """J1 + P2/P3 — inner equi-join on city with the 15-column
    projection (both SERIAL ids never exist here; Catalyst prunes
    anything unused). The lookup side is broadcast: the canonical
    fact ⋈ small-dim pattern that holds at any fact scale."""
    return (
        weather.join(F.broadcast(lookup), on="city", how="inner")
        .select(*FINAL_COLUMNS)
    )


def run_reference_pipeline(spark: SparkSession,
                           payloads: list[dict] | None = None) -> DataFrame:
    """End-to-end: payload(s) → flatten/convert → broadcast join →
    final 15-column DataFrame (the reference's final_weather_data)."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    raw = owm_dataframe(spark, payloads or [GOLDEN_OWM_PAYLOAD])
    return join_weather_lookup(flatten_weather(raw), city_lookup(spark))

"""Custom Spark 4 Python Data Source for HTTP JSON ingestion
(SURVEY.md §4.3: "optionally a custom DataSource (Spark 4 Python data
source API) for multi-city parallel fetch").

Registers as ``format("owm_http")``: each input partition fetches one
endpoint *on an executor*, so a thousand-city fetch fans out across
the cluster with no driver bottleneck and integrates with Spark's
retry machinery (a failed fetch fails its task → task retry re-fetches
just that endpoint).

    spark.dataSource.register(OwmHttpDataSource)
    df = (spark.read.format("owm_http")
          .option("urls", ",".join(urls))
          .load())

Offline posture: ``option("fake_payload", json)`` short-circuits the
network with a deterministic document (tests; no fetcher injection is
possible across the serialization boundary, unlike sources/http.py).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

# flattened output schema — the P1 projection applied at the source,
# so downstream sees the reference's houston_weather_data shape minus
# unit conversion (kept relational so F1/F2 stay visible plan steps)
HTTP_SOURCE_SCHEMA = T.StructType([
    T.StructField("city", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("temp_k", T.DoubleType()),
    T.StructField("feels_like_k", T.DoubleType()),
    T.StructField("temp_min_k", T.DoubleType()),
    T.StructField("temp_max_k", T.DoubleType()),
    T.StructField("pressure", T.LongType()),
    T.StructField("humidity", T.LongType()),
    T.StructField("wind_speed", T.DoubleType()),
    T.StructField("dt", T.LongType()),
    T.StructField("timezone", T.LongType()),
    T.StructField("sunrise", T.LongType()),
    T.StructField("sunset", T.LongType()),
])


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class OwmHttpReader(DataSourceReader):
    def __init__(self, options: dict):
        self.urls = [u for u in options.get("urls", "").split(",") if u]
        self.fake_payload = options.get("fake_payload")
        self.timeout_s = float(options.get("timeout_s", "10"))

    def partitions(self) -> list[InputPartition]:
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        if self.fake_payload is not None:
            doc = json.loads(self.fake_payload)
        else:  # pragma: no cover - network path
            import urllib.request

            with urllib.request.urlopen(  # noqa: S310
                    partition.url, timeout=self.timeout_s) as resp:
                doc = json.loads(resp.read().decode("utf-8"))
        main = doc.get("main", {})
        weather0 = (doc.get("weather") or [{}])[0]
        sys_ = doc.get("sys", {})
        yield (
            doc.get("name"),
            weather0.get("description"),
            float(main["temp"]) if "temp" in main else None,
            float(main["feels_like"]) if "feels_like" in main else None,
            float(main["temp_min"]) if "temp_min" in main else None,
            float(main["temp_max"]) if "temp_max" in main else None,
            main.get("pressure"),
            main.get("humidity"),
            float(doc["wind"]["speed"]) if doc.get("wind") else None,
            doc.get("dt"),
            doc.get("timezone"),
            sys_.get("sunrise"),
            sys_.get("sunset"),
        )


class OwmHttpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "owm_http"

    def schema(self) -> T.StructType:
        return HTTP_SOURCE_SCHEMA

    def reader(self, schema: T.StructType) -> OwmHttpReader:
        return OwmHttpReader(self.options)

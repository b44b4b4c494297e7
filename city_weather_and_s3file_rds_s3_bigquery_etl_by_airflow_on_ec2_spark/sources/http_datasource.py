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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
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




def _fetch_doc(url: str, fake_payload: str | None, timeout_s: float) -> dict:
    """Executor-side fetch (or the deterministic offline stand-in)."""
    if fake_payload is not None:
        return json.loads(fake_payload)
    import urllib.request  # pragma: no cover - network path

    with urllib.request.urlopen(  # noqa: S310  # pragma: no cover
            url, timeout=timeout_s) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _flatten_doc(doc: dict) -> tuple:
    """OWM JSON document → one HTTP_SOURCE_SCHEMA row (the P1 flatten
    applied at the source, shared by the batch and stream readers)."""
    main = doc.get("main", {})
    weather0 = (doc.get("weather") or [{}])[0]
    sys_ = doc.get("sys", {})
    return (
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
        yield _flatten_doc(_fetch_doc(partition.url, self.fake_payload,
                                      self.timeout_s))


class _PollPartition(InputPartition):
    def __init__(self, poll: int, url: str):
        self.poll = poll
        self.url = url


class OwmHttpStreamReader(DataSourceStreamReader):
    """Streaming half of the source: the reference's SCHEDULED hourly
    fetch (weather_etl_pipeline.py's cron DAG) re-expressed as a
    Structured Streaming source — one POLL of every endpoint per
    microbatch, offset = completed poll count.

    Scale shape: ``partitions(start, end)`` fans each (poll, url) out
    as its own task, so a thousand-city poll reads on a thousand
    executors; a failed fetch fails one task and Spark's retry
    re-fetches just that endpoint for just that poll.  Offsets are
    checkpointed by the engine — after a restart the stream resumes
    from the committed poll, the exactly-once contract the reference's
    Airflow catchup approximates.

    ``option("max_polls", N)`` stops advancing the offset after N
    polls (tests / bounded backfills); default unbounded.
    """

    def __init__(self, options: dict):
        self.urls = [u for u in options.get("urls", "").split(",") if u]
        self.fake_payload = options.get("fake_payload")
        self.timeout_s = float(options.get("timeout_s", "10"))
        self.max_polls = int(options.get("max_polls", "-1"))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def latestOffset(self) -> dict:
        if self.max_polls < 0 or self._latest < self.max_polls:
            self._latest += 1
        return {"poll": self._latest}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [_PollPartition(p, u)
                for p in range(start["poll"], end["poll"])
                for u in self.urls]

    def read(self, partition: _PollPartition) -> Iterator[tuple]:
        yield _flatten_doc(_fetch_doc(partition.url, self.fake_payload,
                                      self.timeout_s))

    def commit(self, end: dict) -> None:
        pass


class OwmHttpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "owm_http"

    def schema(self) -> T.StructType:
        return HTTP_SOURCE_SCHEMA

    def reader(self, schema: T.StructType) -> OwmHttpReader:
        return OwmHttpReader(self.options)

    def streamReader(self, schema: T.StructType) -> OwmHttpStreamReader:
        return OwmHttpStreamReader(self.options)

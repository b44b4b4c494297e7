"""HTTP JSON ingestion (SURVEY.md §2.1 S1, §2.12 O4 and the S2 probe).

The reference fetches one city's weather per run with requests +
an Airflow HttpSensor (codes/weather_etl_pipeline.py:51-53, :282-286).
Spark has no built-in HTTP source, so the engine provides:

- ``probe`` — bounded-retry availability check (the sensor, O4's retry
  policy folded in), stdlib urllib only;
- ``fetch_json`` — one GET → parsed JSON document;
- ``http_json_source`` — N endpoints → DataFrame. For a handful of
  endpoints the driver fetches serially; for a large endpoint list the
  fetch fans out across executors via ``mapInPandas`` (each Arrow
  batch of URLs is fetched inside the partition), which is the scale
  path: ingest parallelism == partition count, rate limiting stays
  per-executor.

Every function takes an injectable ``fetcher`` so tests (and offline
runs) never touch the network; the default uses stdlib urllib.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Fetcher = Callable[[str], dict]


def _default_fetcher(url: str, timeout_s: float = 10.0) -> dict:
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def probe(url: str, retries: int = 3, delay_s: float = 3.0,
          fetcher: Fetcher | None = None) -> bool:
    """S2 sensor semantics with O4's bounded retry (reference: 1 retry,
    3 s delay). Returns True when the endpoint answers; fails *fast*
    after the retry budget — the engine deliberately does not replicate
    the reference's silent error swallowing (O6)."""
    f = fetcher or _default_fetcher
    for attempt in range(retries + 1):
        try:
            f(url)
            return True
        except Exception:  # noqa: BLE001
            if attempt == retries:
                return False
            time.sleep(delay_s)
    return False


def fetch_json(url: str, fetcher: Fetcher | None = None) -> dict:
    """S1 — GET + JSON decode (F5)."""
    return (fetcher or _default_fetcher)(url)


def http_json_source(
    spark: SparkSession,
    urls: list[str],
    schema: T.StructType,
    fetcher: Fetcher | None = None,
    distributed_threshold: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Materialize JSON documents from ``urls`` as a DataFrame with an
    explicit schema (no inference — SURVEY.md §1.2).

    ≤ ``distributed_threshold`` urls: driver-side fetch (the reference
    shape, one city per run). Above it: the url list becomes a
    DataFrame and fetching runs inside ``mapInPandas`` partitions —
    executor-parallel ingest with no driver bottleneck."""
    f = fetcher or _default_fetcher
    if len(urls) <= distributed_threshold:
        docs = [f(u) for u in urls]
        return spark.createDataFrame(docs, schema=schema)

    url_df = spark.createDataFrame([(u,) for u in urls], ["url"]) \
                  .repartition(num_partitions or min(len(urls) // 8 + 1, 256))
    out_schema = T.StructType([T.StructField("body", T.StringType())])

    def fetch_batch(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({"body": [json.dumps(f(u)) for u in pdf["url"]]})

    bodies = url_df.mapInPandas(fetch_batch, out_schema)
    return bodies.select(
        F.from_json(F.col("body"), schema).alias("doc")).select("doc.*")

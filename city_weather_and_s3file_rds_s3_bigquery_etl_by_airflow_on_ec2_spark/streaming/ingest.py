"""Incremental ingestion (SURVEY.md §7 phase 4): the Spark-native
replacement for the reference's @daily re-run-and-append loop.

Payloads land as JSON files in a landing directory (the S3 ``raw_data/``
analog); a Structured Streaming query with ``Trigger.AvailableNow``
drains whatever has arrived, flattens/converts (the reference's P1+F1+F2),
deduplicates within the batch, and commits idempotently to the
warehouse via ``merge_append`` inside ``foreachBatch``. Checkpointing
makes re-runs skip already-ingested files; the merge key makes even a
wiped checkpoint converge instead of duplicating (O7 both belts).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.reference_pipeline import OWM_SCHEMA, flatten_weather
from ..sources import warehouse

MERGE_KEY = ["city", "time_of_record"]


def land_payloads(landing_dir: str, payloads: list[dict]) -> list[str]:
    """Drop raw JSON documents into the landing directory (what the
    fetch task does in production; tests call this directly)."""
    os.makedirs(landing_dir, exist_ok=True)
    paths = []
    for p in payloads:
        name = f"owm_{p.get('id', 0)}_{p.get('dt', 0)}.json"
        path = os.path.join(landing_dir, name)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(p, f)
        paths.append(path)
    return paths


def ingest_available(spark: SparkSession, landing_dir: str,
                     warehouse_path: str, checkpoint_dir: str) -> DataFrame:
    """Drain the landing directory once (AvailableNow), merge new rows
    into the warehouse, return the warehouse state."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    stream = (spark.readStream.schema(OWM_SCHEMA)
              .option("multiLine", "true")
              .json(landing_dir))
    flat = flatten_weather(stream)

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        warehouse.merge_append(
            batch_df.dropDuplicates(MERGE_KEY), warehouse_path, MERGE_KEY)

    q = (flat.writeStream
         .foreachBatch(commit)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.read.parquet(warehouse_path)

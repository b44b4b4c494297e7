"""Streaming deduplication (SURVEY.md §2.10 + §2.13 crossover): the
drop-repeated-records shape every streaming ingest needs, through real
Structured Streaming state.

Two variants:

* ``run_dedup_stream`` — unbounded-key ``dropDuplicates`` on the key
  columns.  State grows with the distinct-key cardinality; correct for
  bounded key domains (entity ids, enum pairs).  With
  ``Trigger.AvailableNow`` over a bounded source the emitted set is
  exactly the batch ``SELECT DISTINCT`` on the keys, so the entry is
  fully SQL-oracle-checkable.
* ``run_dedup_within_watermark_stream`` —
  ``dropDuplicatesWithinWatermark``: state for a key is evicted once
  the watermark passes its event time + delay, so state is bounded by
  (arrival rate × watermark window) regardless of key cardinality —
  the form that survives an unbounded 100 TB/day firehose.  Exactness
  caveat: a duplicate arriving after its first occurrence's state was
  evicted is re-emitted, so this variant equals DISTINCT only when all
  duplicates of a key land within the watermark delay (true for the
  bounded test corpus, where everything arrives in one micro-batch).

Both emit only the key columns (append mode): which physical row
"wins" inside a micro-batch is not deterministic, the key set is.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEYS = ["user_id", "event_type"]


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import ensure_session_confs
    from ..sources.tables import normalize_event_ts

    ensure_session_confs(spark)
    from ..sources.tables import read_parquet_schema
    raw_schema = read_parquet_schema(spark, f"{sf_dir}/events.parquet")
    s = (spark.readStream.schema(raw_schema)
         .option("pathGlobFilter", "events.parquet")
         .parquet(sf_dir))
    return normalize_event_ts(s)


def _settle(agg: DataFrame, name: str) -> DataFrame:
    from . import rotate_sink

    spark = agg.sparkSession
    qname = rotate_sink(spark, name, f"{name}_{uuid.uuid4().hex[:8]}")
    query = (agg.writeStream.outputMode("append")
             .format("memory").queryName(qname)
             .trigger(availableNow=True)
             .start())
    try:
        query.awaitTermination()
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    return spark.table(qname)


def run_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence-only (user_id, event_type) pairs via streaming
    ``dropDuplicates`` — settled set == batch DISTINCT on the keys."""
    stream = _event_stream(spark, sf_dir).select(*_KEYS)
    return _settle(stream.dropDuplicates(_KEYS), "streamdedup")


def run_dedup_within_watermark_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours",
) -> DataFrame:
    """Bounded-state streaming dedup via
    ``dropDuplicatesWithinWatermark`` (state evicted behind the
    watermark); equals DISTINCT here because the bounded source
    delivers every duplicate inside the delay window."""
    stream = (_event_stream(spark, sf_dir)
              .select("ts", *_KEYS)
              .withWatermark("ts", watermark))
    deduped = (stream.dropDuplicatesWithinWatermark(_KEYS)
               .select(*_KEYS))
    return _settle(deduped, "streamdedupwm")

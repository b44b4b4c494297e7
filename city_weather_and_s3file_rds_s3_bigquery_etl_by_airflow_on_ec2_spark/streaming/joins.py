"""Stream-stream joins (SURVEY.md §2.10): the event-correlation shape
(click ⋈ preceding views of the same user within a time bound) through
a real Structured Streaming inner interval join.

Spark buffers both sides in keyed state; the event-time range condition
plus the watermark bound how much state is retained (views older than
``lookback`` + watermark past the stream's max event time are evicted).
With ``Trigger.AvailableNow`` over a bounded file source the emitted
set equals the batch time-bounded self-join, so the entry is fully
SQL-oracle-checkable — the streaming engine's join/state machinery is
what is actually under test.

At 100 TB the shape is the standard symmetric hash join partitioned by
``user_id``: state per key bounded by the interval width, late rows
dropped by the watermark; skewed users are the operational risk
(AQE does not apply inside micro-batches — pre-salt hot keys upstream
if one user dominates).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    lookback: str = "60 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming click←view correlation: for every 'click' event, the
    'view' events of the same user with ``c.ts - lookback <= v.ts <=
    c.ts``. Returns the settled pairs with the gap in seconds."""
    from ..session import ensure_session_confs
    from ..sources.tables import normalize_event_ts

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def side(event_type: str, prefix: str) -> DataFrame:
        s = (spark.readStream.schema(raw_schema)
             .option("pathGlobFilter", "events.parquet")
             .parquet(sf_dir))
        s = normalize_event_ts(s)  # nanos-as-long OR micros-NTZ
        return (s.where(F.col("event_type") == event_type)
                .select(F.col("event_id").alias(f"{prefix}_id"),
                        F.col("user_id").alias(f"{prefix}_user"),
                        F.col("ts").alias(f"{prefix}_ts"))
                .withWatermark(f"{prefix}_ts", watermark))

    clicks = side("click", "click")
    views = side("view", "view")
    joined = clicks.join(
        views,
        (F.col("click_user") == F.col("view_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(
            f"INTERVAL {lookback}")),
        "inner")
    from . import rotate_sink
    qname = rotate_sink(spark, "intervaljoin",
                        f"intervaljoin_{uuid.uuid4().hex[:8]}")
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName(qname)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        if q.isActive:  # pragma: no cover
            q.stop()
    return spark.table(qname).select(
        F.col("click_id"), F.col("view_id"),
        F.col("click_user").alias("user_id"),
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts"))
        .cast("long").alias("gap_sec"),
    )

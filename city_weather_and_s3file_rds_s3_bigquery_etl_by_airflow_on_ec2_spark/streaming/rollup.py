"""Continuous aggregate ("hypertable rollup" analog): a streaming
windowed aggregation maintained in a warehouse table via
``foreachBatch`` — the pattern that replaces the reference's
append-and-duplicate daily reload (SURVEY.md §2.10/§2.12 O7) with an
idempotent, incrementally-maintained rollup.

``foreachBatch`` is the exactly-once seam: each micro-batch delivers
the updated aggregate state, and the sink callback commits it with a
deterministic overwrite (or MERGE with Delta/Iceberg on the
classpath), so replays converge instead of duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import warehouse


def continuous_hourly_rollup(spark: SparkSession, sf_dir: str,
                             out_path: str) -> DataFrame:
    """Maintain an hourly (window_start, event_type) rollup of the
    events stream in a parquet warehouse table; returns the settled
    rollup. Re-running converges to the same table (idempotent)."""
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
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "sum_value")
    )

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        # complete-mode batch carries the full updated rollup →
        # deterministic replace; with Delta this becomes MERGE on
        # (window_start, event_type)
        warehouse.overwrite(batch_df, out_path)

    q = (agg.writeStream.outputMode("complete")
         .foreachBatch(commit)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.read.parquet(out_path)

"""Streaming → JDBC upsert sink via ``foreachBatch``.

The reference appends each DAG run's rows into RDS Postgres with
blind INSERTs (codes/weather_etl_pipeline.py:182 execute_values), so
a re-run duplicates rows.  The streaming engine's exactly-once story
needs an idempotent sink instead: Structured Streaming offers no
built-in JDBC sink, and the canonical pattern is ``foreachBatch`` —
each micro-batch arrives as a regular DataFrame together with a
monotonically increasing ``batch_id``, and the body applies the same
key-based merge-append the batch warehouse sink uses
(sources/warehouse.merge_append): dedup within the batch, anti-join
against the destination's current keys, append only the remainder.

Replay safety: after a crash the last un-committed batch is
re-delivered with the SAME batch_id; every row it inserted before the
crash is filtered by the key anti-join, so the sink converges to
exactly-once *effects* on at-least-once delivery — asserted by the
replay test in tests/test_sources_sinks.py.

Scale: the anti-join reads only the key columns through JDBC
(projection pushed to the database); with a million-row destination
and kilobyte batches the transferred key set, not the table, bounds
the cost.  For truly large destinations swap the key read for a
database-side staging table + MERGE statement — the foreachBatch
structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.jdbc import JdbcEndpoint, jdbc_append_writer, jdbc_table_reader

_MISSING_TABLE_MARKERS = ("does not exist", "not found", "42X05")


def upsert_batch_jdbc(batch_df: DataFrame, ep: JdbcEndpoint, table: str,
                      key_cols: list[str]) -> None:
    """Idempotent per-batch body: batch-local dedup → anti-join on the
    destination's existing keys → append.  Usable directly for batch
    jobs too (same contract as warehouse.merge_append)."""
    spark = batch_df.sparkSession
    incoming = batch_df.dropDuplicates(key_cols)
    try:
        existing = jdbc_table_reader(spark, ep, table).load() \
            .select(*key_cols)
        incoming = incoming.join(existing, on=key_cols, how="left_anti")
    except Exception as ex:  # noqa: BLE001 — Py4J wraps the SQLException
        msg = str(ex)
        if not any(m in msg for m in _MISSING_TABLE_MARKERS):
            raise
        # first batch: destination not created yet — append creates it
    jdbc_append_writer(incoming, ep, table).save()


def jdbc_upsert_stream(stream_df: DataFrame, ep: JdbcEndpoint, table: str,
                       key_cols: list[str], checkpoint_dir: str):
    """Attach the upsert sink to a streaming DataFrame; returns the
    unstarted ``DataStreamWriter`` (callers pick the trigger —
    tests use ``trigger(availableNow=True)``)."""
    def _body(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_jdbc(batch_df, ep, table, key_cols)

    return (stream_df.writeStream
            .foreachBatch(_body)
            .option("checkpointLocation", checkpoint_dir))

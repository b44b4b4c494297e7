"""Arbitrary stateful processing v2: ``transformWithStateInPandas``
(Spark 4, SPARK-46815) — the successor API to
``applyInPandasWithState`` (streaming/stateful.py).

Why both exist in this engine: the v1 operator passes ONE opaque
state tuple per key; the v2 ``StatefulProcessor`` gets a typed state
handle (value/list/map state, TTL, timers) and composes with the
RocksDB state store — the API Spark is converging on for CDC folding,
sessionization and online features.  The operator below is the SAME
per-user running-totals contract as v1, so the two APIs are checked
against each other AND against the batch aggregate (the registry
entry's oracle), proving the migration path preserves semantics.

Scale notes: state is hash-partitioned by the grouping key and lives
in RocksDB (spillable, incremental checkpoints) instead of the
executor heap — the property that makes 10^9-key state feasible;
``transformWithState`` REQUIRES the RocksDB provider, which this
operator pins for its own query only (restoring the session conf).

CONTAINER-BLOCKED (same posture as the BigQuery connector,
sources/warehouse.py): the v2 API's driver-side state server speaks
protobuf, and this container ships no ``google.protobuf`` (installs
are not permitted).  ``probe_transform_with_state()`` reports the
dependency state; the executable correctness test self-skips when the
probe fails and runs for real wherever protobuf exists.  The v1
operator (stateful.py) — which needs no protobuf — remains the
oracle-checked registry entry.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def probe_transform_with_state() -> str | None:
    """None when the v2 API can run here; otherwise the blocking
    reason.  transformWithStateInPandas starts a protobuf-speaking
    Python state server, so ``google.protobuf`` must be importable in
    the worker environment."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as ex:
        return f"google.protobuf unavailable: {ex}"
    return None


class _RunningTotals(StatefulProcessor):
    """Typed ValueState (n BIGINT, total DOUBLE) per user; one update
    row per (user, micro-batch) — identical contract to stateful.py's
    v1 operator."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n BIGINT, total DOUBLE")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        n, total = (self._state.get() if self._state.exists()
                    else (0, 0.0))
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 2)]})

    def close(self) -> None:
        pass


def running_user_totals_stream_v2(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Drive the v2 stateful operator over the bounded events stream;
    returns the final per-user totals as a batch DataFrame (same
    output contract as the v1 ``running_user_totals_stream``)."""
    from ..session import ensure_session_confs
    from ..sources.tables import normalize_event_ts
    from . import rotate_sink
    from .stateful import final_user_state

    ensure_session_confs(spark)
    from ..sources.tables import read_parquet_schema
    raw_schema = read_parquet_schema(spark, f"{sf_dir}/events.parquet")
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    stream = normalize_event_ts(stream)
    updated = (stream.groupBy("user_id")
               .transformWithStateInPandas(
                   _RunningTotals(), OUTPUT_SCHEMA,
                   outputMode="Update", timeMode="None"))
    qname = rotate_sink(spark, "statefulv2",
                        f"statefulv2_{uuid.uuid4().hex[:8]}")
    prev_provider = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        q = (updated.writeStream.outputMode("update")
             .format("memory").queryName(qname)
             .trigger(availableNow=True).start())
        try:
            q.awaitTermination()
        finally:
            if q.isActive:  # pragma: no cover
                q.stop()
    finally:
        if prev_provider is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev_provider)
    return final_user_state(spark.table(qname))

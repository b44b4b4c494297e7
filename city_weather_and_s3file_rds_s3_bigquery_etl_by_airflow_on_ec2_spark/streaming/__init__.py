"""Structured Streaming posture (SURVEY.md §2.10).

The reference's "incremental" behavior is a daily Airflow re-run with
duplicate-appending sinks; the engine replaces that with Structured
Streaming: bounded re-processing via ``Trigger.AvailableNow``,
event-time windows + watermarks for late data, and ``foreachBatch``
for idempotent external sinks.
"""

from pyspark.sql import SparkSession

# One live memory-sink table per streaming entry point ("prefix"): a
# memory sink pins its full result in driver memory and its temp-view
# registration lives for the session, so repeated invocations (bench
# passes, registry sweeps, long-lived notebook sessions) accumulate
# state without bound. Each entry point drops ITS OWN previous sink
# before starting a new query. Result-lifecycle contract: the returned
# DataFrame reads the sink table and stays valid until the SAME entry
# point runs again on the session — materialize before re-invoking.
_LIVE_SINKS: dict[str, str] = {}


def rotate_sink(spark: SparkSession, prefix: str, qname: str) -> str:
    """Register ``qname`` as ``prefix``'s live sink, dropping the
    previous one (bounds per-session sink state at one per entry
    point)."""
    old = _LIVE_SINKS.get(prefix)
    if old is not None:
        try:
            spark.catalog.dropTempView(old)
        except Exception:  # view already gone — nothing to bound
            pass
    _LIVE_SINKS[prefix] = qname
    return qname


from .windows import run_tumbling_count_stream, sessionize  # noqa: E402

__all__ = ["run_tumbling_count_stream", "sessionize", "rotate_sink"]

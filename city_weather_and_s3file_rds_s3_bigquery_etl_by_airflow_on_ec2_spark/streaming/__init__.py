"""Structured Streaming posture (SURVEY.md §2.10).

The reference's "incremental" behavior is a daily Airflow re-run with
duplicate-appending sinks; the engine replaces that with Structured
Streaming: bounded re-processing via ``Trigger.AvailableNow``,
event-time windows + watermarks for late data, and ``foreachBatch``
for idempotent external sinks.
"""

from .windows import run_tumbling_count_stream, sessionize

__all__ = ["run_tumbling_count_stream", "sessionize"]

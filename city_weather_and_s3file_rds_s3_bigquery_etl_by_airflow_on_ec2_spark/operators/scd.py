"""Slowly-changing-dimension type 2 (CDC fold) without a transactional
table format: anti-join + union, the standard parquet-posture
emulation of MERGE INTO (with Delta/Iceberg on the classpath the same
API becomes one MERGE statement).

History model: one row per (key, version) with ``valid_from``,
``valid_to`` (NULL = open) and ``is_current``. ``scd2_apply`` folds a
batch of updates in: rows whose tracked attributes changed are closed
at the update timestamp and a new open version is inserted; unchanged
updates are no-ops (idempotent replay, SURVEY.md §2.12 O7).

Scale: three hash-joins on the key — closed/open discrimination never
scans history versions (only ``is_current`` rows join the updates),
so cost tracks |updates| + |open rows|, not table history size.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, effective_ts) -> DataFrame:
    """Bootstrap a history table from a first snapshot."""
    return snapshot.select(
        "*",
        F.lit(effective_ts).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _differs(tracked_cols: list[str]) -> F.Column:
    preds = [~F.col(f"u.{c}").eqNullSafe(F.col(f"o.{c}"))
             for c in tracked_cols]
    return functools.reduce(lambda a, b: a | b, preds)


def scd2_apply(history: DataFrame, updates: DataFrame,
               key_cols: list[str], tracked_cols: list[str],
               effective_ts) -> DataFrame:
    """Fold one update batch into the history table; returns the new
    history. ``updates`` must be unique per key (pre-aggregate the
    batch to last-update-wins upstream)."""
    ts = F.lit(effective_ts).cast("timestamp")
    data_cols = [c for c in history.columns if c not in META]

    closed_hist = history.where(~F.col("is_current"))
    open_rows = history.where(F.col("is_current"))

    o, u = open_rows.alias("o"), updates.alias("u")
    changed_keys = (
        o.join(u, on=key_cols).where(_differs(tracked_cols))
        .select(*[F.col(f"o.{k}") for k in key_cols]))

    # close superseded versions
    newly_closed = (
        open_rows.join(changed_keys, on=key_cols, how="left_semi")
        .withColumn("valid_to", ts)
        .withColumn("is_current", F.lit(False)))
    still_open = open_rows.join(changed_keys, on=key_cols, how="left_anti")

    # insert new versions: changed keys + brand-new keys
    existing_keys = open_rows.select(*key_cols)
    incoming_new = (
        updates.join(existing_keys, on=key_cols, how="left_anti")
        .unionByName(updates.join(changed_keys, on=key_cols,
                                  how="left_semi")))
    inserted = scd2_init(incoming_new.select(*data_cols), effective_ts)

    return (closed_hist
            .unionByName(newly_closed)
            .unionByName(still_open)
            .unionByName(inserted))

"""As-of and range joins — operators Spark lacks natively
(SURVEY.md §2.4), built as compositions of existing DataFrame ops so
Catalyst still owns the physical plan.

As-of join strategy (the scalable one, no UDF): union the two sides
with a side marker, sort within each key partition by (time, marker),
and carry the right-side payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
One shuffle on the key — identical shuffle shape to the equivalent
sort-merge join — and no per-group Python. This beats the
``applyInPandas`` + ``pd.merge_asof`` alternative at scale because the
window is whole-stage-codegen'd and never materializes a per-key pandas
frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MARKER = "__asof_is_left"
_TIME = "__asof_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gets the payload of the nearest right
    row for the same key — the latest with ``right_time <= left_time``
    (``direction="backward"``, default) or the earliest with
    ``right_time >= left_time`` (``direction="forward"``). Equality
    inclusive in both directions.

    ``right`` must be unique per (on, right_time); pre-aggregate it
    otherwise, or the carried payload is ambiguous in *any* engine.
    Payload columns are emitted with their original names; left columns
    pass through unchanged — therefore a payload name colliding with a
    left column would produce duplicate output columns, and the call
    rejects it up front (rename on the right side first).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload_cols {sorted(clash)} already exist in the left side; "
            "rename them on right (e.g. .withColumnRenamed) before asof_join")
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_MARKER),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
          for c in payload_cols],
    )
    r = right.select(
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != on],
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_MARKER),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    ).select(*l.columns)  # align column order for unionByName-free union

    combined = l.unionByName(r)
    if direction == "backward":
        # right rows sort before left rows at equal time (inclusive <=)
        w = (Window.partitionBy(on)
             .orderBy(F.col(_TIME), F.col(_MARKER))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carry = [F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
                 for c in payload_cols]
    else:
        # forward: right rows sort after left rows at equal time, and
        # the first following non-null payload is carried backward
        w = (Window.partitionBy(on)
             .orderBy(F.col(_TIME), (1 - F.col(_MARKER)))
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        carry = [F.first(f"__p_{c}", ignorenulls=True).over(w).alias(c)
                 for c in payload_cols]
    carried = combined.select(*left_cols, F.col(_MARKER), *carry)
    return carried.where(F.col(_MARKER) == 1).drop(_MARKER)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width_expr: str,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Interval/range join: match left rows whose ``left_point`` falls
    in [right_lo, right_hi). Naive Spark plans this as a broadcast
    nested-loop join (O(n·m) comparisons); binning rewrites it as an
    equi-join on the bin id — each right interval is exploded to the
    bins it overlaps, then bin-equality drives a hash join and the
    exact predicate filters residuals. This is the standard public
    range-join optimization (cf. Databricks' range-join binning) and
    keeps the plan shuffle-based at 100 TB.

    ``bin_width_expr`` is a SQL expression string for the bin width in
    the units of the point column (e.g. ``"86400"`` for 1-day bins over
    epoch seconds).
    """
    on = extra_on or []
    lb = left.withColumn("__bin",
                         (F.expr(left_point) / F.expr(bin_width_expr)).cast("long"))
    r_lo_bin = (F.expr(right_lo) / F.expr(bin_width_expr)).cast("long")
    r_hi_bin = (F.expr(right_hi) / F.expr(bin_width_expr)).cast("long")
    rb = right.withColumn(
        "__bin", F.explode(F.sequence(r_lo_bin, r_hi_bin))
    )
    joined = lb.join(rb, on=on + ["__bin"], how="inner").drop("__bin")
    return joined.where(
        (F.expr(left_point) >= F.expr(right_lo))
        & (F.expr(left_point) < F.expr(right_hi))
    )

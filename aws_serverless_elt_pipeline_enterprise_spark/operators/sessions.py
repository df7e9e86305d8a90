"""Gap-based sessionization: assign each event a per-key session id that
increments whenever the gap to the previous event exceeds a threshold.

Two windows over ONE per-key sort (Catalyst reuses the sort for both the
lag and the running sum — a single shuffle + single sort in the physical
plan): classic cumulative-sum-of-boundaries formulation, exact and
engine-portable (integer second arithmetic). For streaming, Spark's
built-in ``session_window`` aggregate covers the windowed-agg case; this
operator is the batch/event-level assignment (every row keeps its
session id, which the aggregate form does not give you).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order: str = "event_id",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Adds ``session_id`` (1-based per key). Ordering is (ts, order) with
    ``order`` a unique tiebreaker so results are deterministic."""
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(order))
    prev_ts = F.lag(ts).over(w)
    boundary = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev_ts)) > gap_seconds),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", F.sum(boundary).over(run)
    )

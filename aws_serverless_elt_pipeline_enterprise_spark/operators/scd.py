"""SCD Type-2 dimension history from a change stream.

The engine's LWW reduction (operators/lww.py, reference parity:
lambdas/transform/app.py latest-state materialization) keeps only the
CURRENT row per key. SCD2 is the other canonical CDC sink shape: every
state version survives, carrying its validity interval — the
point-in-time layout that warehouse dimension tables and the as-of join
(operators/asof.py) consume.

One window per key (shuffle on key + sort by seq — the same single-pass
shape as sessionization): ``valid_from`` is the version's own event time,
``valid_to`` the NEXT change's event time (NULL while current),
``is_current`` the open interval. Rows matching ``delete_when`` act as
tombstones: they CLOSE the predecessor's interval (their timestamp
becomes its valid_to) but emit no version themselves, so a
deleted-then-reinserted key shows a gap — the correct dimensional answer
for "this key did not exist between t1 and t2".

At 100 TB this is one shuffle of the changelog partitioned by key with a
per-key sort — no self-join, no second pass; skewed hot keys are bounded
by their own history length, and the changelog feeding this is already
epoch-partitioned by the replay engine so incremental SCD2 maintenance
processes only new epochs' keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str = "user_id",
    seq: str = "event_id",
    ts: str = "ts",
    delete_when: F.Column | None = None,
) -> DataFrame:
    """Expand a change stream into SCD Type-2 history rows.

    ``seq`` (not ``ts``) is the change order authority — the same
    convention as lww_reduce, so an out-of-order feed yields the same
    history on every replay. The tombstone filter runs AFTER the lead()
    window so a delete still closes its predecessor's interval.
    """
    w = Window.partitionBy(key).orderBy(seq)
    out = df.withColumn("valid_from", F.col(ts)).withColumn(
        "valid_to", F.lead(ts).over(w)
    )
    if delete_when is not None:
        out = out.filter(~F.coalesce(delete_when, F.lit(False)))
    return out.withColumn("is_current", F.col("valid_to").isNull())

"""Per-key last-writer-wins reduction (operator D3).

The reference pipeline is append-only; the north rule adds LWW: late and
out-of-order change events are resolved by keeping, per key, the event
with the maximum sequence number. Expressed as ``max_by(struct(payload),
ordering)`` — a hash aggregate with map-side partial combine, which beats
the window/row_number formulation (no sort, no full shuffle of losers).

Skew (operator R3): hot doc_ids concentrate a reduce on few tasks. The
salted two-phase variant first reduces per (key, salt) — spreading a hot
key over ``n_salts`` tasks — then reduces the ≤n_salts survivors per key.
The reference has no analogue (Lambda shards per S3 object); this is the
explicit salting the north rule requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordering(seq: str, payload_cols: list[str]) -> F.Column:
    # Deterministic total order: seq, then a payload hash so an (illegal
    # but possible) pair of distinct events with equal seq still reduces
    # reproducibly — bit-for-bit replay equality requires a stable winner.
    return F.struct(
        F.col(seq),
        F.xxhash64(*[F.col(c) for c in payload_cols]),
    )


def lww_reduce(
    df: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Reduce to one row per key: the max-seq event, all columns kept."""
    payload_cols = [c for c in df.columns if c != key]
    agg = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols]),
        _ordering(seq, payload_cols),
    ).alias("w")
    if salted:
        salt = F.pmod(F.xxhash64(F.col(key), F.col(seq)), F.lit(n_salts))
        partial = (
            df.withColumn("__salt", salt)
            .groupBy(key, "__salt")
            .agg(agg)
            .select(key, *[F.col(f"w.{c}").alias(c) for c in payload_cols])
        )
        df = partial
    return (
        df.groupBy(key)
        .agg(agg)
        .select(key, *[F.col(f"w.{c}").alias(c) for c in payload_cols])
    )

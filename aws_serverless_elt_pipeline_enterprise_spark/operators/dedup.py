"""Idempotent envelope deduplication (operator D1).

Translates the reference's object-level idempotency lock — a DynamoDB
conditional put on ``pk = s3://bucket/key#etag`` with a 30-day TTL
(reference lambdas/ingest/app.py:43-44, :84-126, :133) — into Spark's
native dedup state:

  * batch mode:     ``dropDuplicates([key, seq])`` — an exchange-free
                    map-side-combinable aggregate under AQE.
  * streaming mode: ``withWatermark(event_time, ttl)`` +
                    ``dropDuplicatesWithinWatermark`` — the watermark
                    horizon IS the DynamoDB TTL: state for (key, seq)
                    pairs older than the horizon is evicted, bounding
                    dedup-state size at 10^10-event scale. Cross-horizon
                    replays are still safe because the downstream MERGE
                    is idempotent by construction (seq > _seq guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(
    df: DataFrame, key: str = "doc_id", seq: str = "seq"
) -> DataFrame:
    """Exact duplicate-envelope removal within a batch.

    Safe to keep an arbitrary winner: two envelopes with equal (key, seq)
    are by contract the same immutable event (the reference caches and
    replays the first response for a duplicate object for the same reason,
    lambdas/ingest/app.py:95-101).
    """
    return df.dropDuplicates([key, seq])


def dedup_events_stream(
    df: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
    event_time: str = "event_time",
    ttl: str = "30 days",
) -> DataFrame:
    """Streaming dedup with watermark-bounded state (TTL = reference's
    30-day DynamoDB TTL)."""
    return df.withWatermark(event_time, ttl).dropDuplicatesWithinWatermark([key, seq])

"""Custom stateful streaming operator: per-key LWW via
applyInPandasWithState.

The built-in ``dropDuplicatesWithinWatermark`` covers exact-duplicate
suppression (operator W1), but a CDC tail sometimes needs the FULL
latest-payload-per-key state held in the stream itself — e.g. to serve
"current state" continuously without a table read-back, or to emit only
keys whose winner actually changed. That is arbitrary stateful
processing: ``applyInPandasWithState`` with an event-time timeout so
idle keys are evicted once the watermark passes their TTL (the same
bounded-state contract as the reference's 30-day DynamoDB TTL,
lambdas/ingest/app.py:84-126).

Per-batch work inside the function is pandas-vectorized (groupby.idxmax
over the Arrow batch) — no per-row Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id string, seq long, op string, n_tok long"
STATE_SCHEMA = "seq long, op string, n_tok long"


def _update_fn(ttl_ms: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last-change + TTL: evict (bounded state)
            state.remove()
            return
        # None sentinel, NOT an in-band (-1, None, None): a genuine first
        # event with seq=-1 and all-null payload would rank exactly equal
        # to that sentinel and be silently dropped (negative seqs are
        # legal in some CDC sources' backfill ranges)
        best_seq, best_op, best_ntok = (
            state.get if state.exists else (None, None, None)
        )

        def rank(op, ntok):
            # total order over the payload for equal-seq ties; None sorts
            # lowest (mirrors pandas na_position='first')
            return (
                (1, op) if op is not None else (0, ""),
                (1, ntok) if ntok is not None else (0, 0),
            )

        changed = False
        saw_rows = False
        for pdf in pdfs:
            # null-seq rows cannot participate in LWW ordering (and an
            # all-null chunk would make the max-filter empty -> IndexError)
            pdf = pdf[pdf["seq"].notna()]
            if pdf.empty:
                continue
            saw_rows = True
            # Equal-seq ties broken by the (op, n_tok) payload order
            # EVERYWHERE — within a chunk (sort of the tied rows), across
            # the multiple Arrow chunks a large group is delivered in, and
            # against the carried state — NOT by idxmax first-occurrence
            # (chunk assignment follows shuffle-fetch order, so that was
            # replay-unstable). na_position='last' matches rank(): None
            # payloads rank LOWEST both within a chunk and across chunks
            # (with 'first' a null-n_tok row beat a non-null one inside a
            # chunk but lost across chunks — chunk-boundary-dependent).
            # Mirrors the table merge's deterministic total order on
            # (seq, payload tie-break); the exact tie KEY differs (the
            # merge hashes with xxhash64, unavailable here) but both
            # paths are individually replay-stable.
            cand = pdf[pdf["seq"] == pdf["seq"].max()]
            if len(cand) > 1:  # vectorized: sort only the tied rows
                cand = cand.sort_values(
                    ["op", "n_tok"], ascending=False, na_position="last"
                )
            i = cand.index[0]
            seq = int(pdf["seq"].loc[i])
            ov = pdf["op"].loc[i]
            op = None if pd.isna(ov) else str(ov)  # str(None) would forge 'None'
            nt = pdf["n_tok"].loc[i]
            ntok = None if pd.isna(nt) else int(nt)
            if (
                best_seq is None
                or seq > best_seq
                or (seq == best_seq and rank(op, ntok) > rank(best_op, best_ntok))
            ):
                best_seq, best_op, best_ntok = seq, op, ntok
                changed = True
        if saw_rows and state.exists and not changed:
            # duplicate / non-advancing traffic still proves the key is
            # ALIVE: re-arm the TTL, or a key receiving only duplicates
            # for > ttl gets evicted mid-traffic and a later stale
            # duplicate (seq < evicted winner) re-emits a REGRESSED state
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        if changed:
            state.update((best_seq, best_op, best_ntok))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
            yield pd.DataFrame(
                [
                    {
                        "doc_id": key[0],
                        "seq": best_seq,
                        "op": best_op,
                        "n_tok": best_ntok,
                    }
                ]
            )

    return update


def lww_latest_stream(
    events: DataFrame,
    watermark: str = "1 hour",
    ttl_minutes: int = 60 * 24 * 30,
) -> DataFrame:
    """Streaming per-key latest-state: emits (doc_id, seq, op, n_tok) each
    time a key's winner advances; state per key is one row, evicted after
    ``ttl_minutes`` of event-time inactivity. Input needs ``event_time``
    (for the watermark), ``doc_id``, ``seq``, ``op``, ``n_tok``."""
    with_wm = events.withWatermark("event_time", watermark)
    return (
        with_wm.select("doc_id", "seq", "op", "n_tok", "event_time")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update_fn(ttl_minutes * 60_000),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Streaming lineage/metrics (operator A3 + north_rule lineage).

The reference emits per-invoke counters to CloudWatch (EMF logs,
lambdas/ingest/app.py:136-171). Here the same surface is a
StreamingQueryListener that captures each micro-batch's progress —
offsets, rows, durations — into rows a DataFrame can query, plus the
per-epoch manifest lineage the SnapshotTable already records (snapshot
IDs, commit dirs, row counts). Together they give offsets -> snapshot
traceability per partition per epoch.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class LineageListener(StreamingQueryListener):
    """Collects per-micro-batch progress rows on the driver. Bounded: a
    long-running query at short trigger intervals would otherwise grow
    one offset-JSON dict per micro-batch forever on the driver heap —
    keep the newest ``max_rows`` (durable lineage lives in the table
    manifests; this is the hot in-memory tail for dashboards/tests)."""

    def __init__(self, max_rows: int = 10_000) -> None:
        from collections import deque

        self.progress: deque = deque(maxlen=max_rows)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "sources": json.dumps([s.description for s in p.sources]),
                "start_offset": json.dumps([s.startOffset for s in p.sources]),
                "end_offset": json.dumps([s.endOffset for s in p.sources]),
                "duration_ms": json.dumps(dict(p.durationMs)),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def to_df(self, spark: SparkSession):
        return spark.createDataFrame(list(self.progress)) if self.progress else None

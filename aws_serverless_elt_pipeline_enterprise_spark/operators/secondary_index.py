"""CDF-maintained secondary index: value-pruned point lookups on a
NON-key column of a SnapshotTable.

``SnapshotTable.lookup`` serves key probes by hashing the key to its
bucket (reads ~1/n_buckets of the table). A predicate on any OTHER
column still scans every bucket — the reference has the same gap: its
silver table is partitioned by (record_type, dt) only, so an Athena
probe like ``WHERE shipment_id = X`` (Instructions.md:127-130) is a
full-partition scan.

``SecondaryIndex`` closes it with an index TABLE: one row per
(indexed value, doc_id), stored in a SnapshotTable that is *keyed* by
the (value, doc) pair but *bucketed by the value* (``bucket_col``), so
``lookup(value)`` hashes the value to its bucket and reads
~1/n_buckets of the INDEX. The bucket_col invariant (a key's bucket
value never changes) holds by construction: the value is embedded in
the key — a doc whose indexed value changes produces a DELETE of the
old index entry and an ADD of the new one, never a mutation.

Maintenance is the shared CDF-consumer protocol (``cdf_consumer.py``):
each refresh turns ``changes(images='both')`` into index entry ops —
``insert``/``update_postimage`` add ``(value_post, doc)``,
``delete``/``update_preimage`` remove ``(value_pre, doc)`` — resolves
same-entry collisions within the span (a value-unchanged update yields
remove+add of the SAME entry; add wins, so the entry survives), and
commits as one ledger-deduped epoch under ``seq = source_version``.
Refresh cost is O(changes), lookup cost is O(bucket), and the index is
exactly-once resumable like every other derived table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tableio.snapshot import SnapshotTable
from .cdf_consumer import CdfBookmark

_SEP = "\x1f"
_NULL = "\x00null"


def _enc(col: F.Column) -> F.Column:
    return F.coalesce(col.cast("string"), F.lit(_NULL))


class SecondaryIndex:
    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        path: str,
        column: str,
        n_buckets: int = 32,
    ):
        if column == source.key_col:
            raise ValueError(
                f"{column!r} is the primary key — use SnapshotTable.lookup"
            )
        self.spark = spark
        self.source = source
        self.path = path
        self.column = column
        self.n_buckets = n_buckets
        self.idx = SnapshotTable(
            spark,
            os.path.join(path, "idx"),
            key_col="_idx_key",
            bucket_col="_idx_val",
            n_buckets=n_buckets,
            mode="mor",
        )
        self._bm = CdfBookmark(os.path.join(path, "bookmark.json"), self.idx)

    # ------------------------------------------------------------ internals

    def _entries(self, rows: DataFrame, ops: bool) -> DataFrame:
        """Project (source rows or change rows) into index-entry rows.
        With ``ops``, change rows become add/remove ops and same-entry
        collisions within the span resolve add-wins."""
        val = _enc(F.col(self.column))
        # LENGTH-PREFIXED key, not a bare separator join: indexed values
        # are arbitrary user data, and a value containing the separator
        # would alias two distinct (value, doc) pairs onto one _idx_key
        # with different _idx_val — violating the bucket_col
        # never-changes invariant (lost/duplicate index entries). With
        # the length prefix the decomposition is unique: equal keys ->
        # equal-length values -> equal (value, doc).
        key = F.concat(
            F.length(val).cast("string"),
            F.lit(":"),
            val,
            F.col(self.source.key_col).cast("string"),
        )
        base = rows.select(
            key.alias("_idx_key"),
            val.alias("_idx_val"),
            F.col(self.source.key_col).cast("string").alias("doc_id"),
            *(
                [
                    F.col("_change_type")
                    .isin("insert", "update_postimage")
                    .alias("__add")
                ]
                if ops
                else []
            ),
        )
        if not ops:
            return base.withColumn("op", F.lit("update"))
        return (
            base.groupBy("_idx_key")
            .agg(
                F.max("__add").alias("__add"),
                F.first("_idx_val").alias("_idx_val"),
                F.first("doc_id").alias("doc_id"),
            )
            .select(
                "_idx_key",
                "_idx_val",
                "doc_id",
                F.when(F.col("__add"), F.lit("update"))
                .otherwise(F.lit("delete"))
                .alias("op"),
            )
        )

    def _rebuild(self, to_version: int) -> dict:
        import shutil

        rows = self._entries(self.source.state(to_version), ops=False)
        rows = rows.withColumn("seq", F.lit(to_version).cast("long"))
        shutil.rmtree(self.idx.root, ignore_errors=True)
        self.idx = SnapshotTable(
            self.spark,
            self.idx.root,
            key_col="_idx_key",
            bucket_col="_idx_val",
            n_buckets=self.n_buckets,
            mode="mor",
        )
        self._bm.derived = self.idx
        lineage = self.idx.merge_reduced(rows, f"cdfboot-{to_version}")
        self._bm.write(to_version)
        return {
            "from_version": None,
            "to_version": to_version,
            "bootstrapped": True,
            "merge": lineage,
        }

    # -------------------------------------------------------------- public

    # shared-diff protocol (streaming.replay._refresh_views)
    cdf_images = "both"

    def cdf_bookmark(self) -> int | None:
        return self._bm.fastforward(self._bm.read())

    def refresh(self, changes=None, to_version=None) -> dict:
        """``changes``/``to_version``: optional pre-computed shared CDF
        diff spanning exactly ``(cdf_bookmark(), to_version]`` with
        ``images='both'`` (see MaterializedAggregate.refresh)."""
        bookmark = self._bm.fastforward(self._bm.read())
        if changes is not None:
            to_v, bootstrapped = to_version, False
        else:
            changes, to_v, bootstrapped = self.source.read_changes_since(
                bookmark, images="both"
            )
        if to_v == bookmark:
            self._bm.write(to_v)
            return {
                "from_version": bookmark,
                "to_version": to_v,
                "bootstrapped": False,
                "noop": True,
            }
        if bootstrapped or bookmark is None:
            return self._rebuild(to_v)
        rows = self._entries(changes, ops=True).withColumn(
            "seq", F.lit(to_v).cast("long")
        )
        lineage = self.idx.merge_reduced(
            rows, CdfBookmark.span_epoch_id(bookmark, to_v)
        )
        self._bm.write(to_v)
        return {
            "from_version": bookmark,
            "to_version": to_v,
            "bootstrapped": False,
            "merge": lineage,
        }

    def lookup(self, values: list) -> DataFrame:
        """doc_ids whose indexed column equals any of ``values`` —
        value-bucket-pruned read of the index (never touches the source
        table). NULL probes find docs whose value IS NULL."""
        enc = [_NULL if v is None else str(v) for v in values]
        if self.idx.current_version() is None:
            return self.spark.createDataFrame(
                [], f"{self.column} string, doc_id string"
            )
        buckets = self.idx.buckets_for(enc)
        return (
            self.idx.read(buckets=buckets)
            .filter(~F.coalesce(F.col(SnapshotTable.DEL_COL), F.lit(False)))
            .filter(F.col("_idx_val").isin(enc))
            .select(
                F.when(F.col("_idx_val") == _NULL, F.lit(None))
                .otherwise(F.col("_idx_val"))
                .alias(self.column),
                "doc_id",
            )
        )

    def lookup_rows(self, values: list) -> DataFrame:
        """Full source rows for the probe values: index lookup for the
        doc_ids, then a KEY-bucket-pruned read of the source — two
        pruned probes instead of one full scan."""
        docs = [r["doc_id"] for r in self.lookup(values).collect()]
        if not docs:
            return self.source.state().limit(0)
        return self.source.lookup(docs)

"""Iceberg TableIO backend — the SURVEY §7.0 contingency made executable.

The sandbox has no Iceberg Spark runtime jar (and no network to fetch
one), so the default MERGE target is the filesystem ``SnapshotTable``
with Iceberg-compatible semantics. This module is the other half of the
contract: a probe (``iceberg_available``) that detects a real runtime at
session start, and an ``IcebergTable`` that executes the documented
MERGE INTO (snapshot.py's merge_epoch docstring — reference parity:
infra/terraform/modules/glue_catalog/main.tf:137-154 registers the Glue
catalog the reference MERGEs through) against a real Iceberg catalog
when the jar exists. tests/test_iceberg_backend.py runs the replay
idempotency/LWW oracle against it, or skips cleanly when the probe says
no runtime — the contingency is code, not prose.

Usage (cluster with the runtime on the classpath)::

    spark = (SparkSession.builder
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", "/path/wh")
        .getOrCreate())
    t = IcebergTable(spark, "local.db.docs", key_col="doc_id")
    t.merge_epoch(batch_df, "epoch-0")
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEQ_COL = "_seq"
DEL_COL = "_deleted"  # tombstone: key deleted at _seq (soft delete —
# keeps the seq watermark so the MERGE guard protects deletes too)
EPOCHS_PROP = "engine.committed_epochs"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in this session's
    JVM. A classpath probe (not a config probe): the extensions conf can
    be set without the jar, which fails only at first use."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _q(ident: str) -> str:
    """Backtick-quote each part of a dotted table identifier."""
    return ".".join(f"`{p}`" for p in ident.split("."))


class IcebergTable:
    """MERGE-target over a real Iceberg table, same apply-epoch contract
    as ``SnapshotTable`` (subset: ``merge_epoch`` / ``has_epoch`` /
    ``state`` / ``committed_epochs``). The change batch is first reduced
    key-locally (dedup + LWW via one partial-aggregable ``max_by`` — the
    same single-shuffle reduction the filesystem backend uses), then a
    MERGE INTO applies it with the ``seq > _seq`` idempotency guard.

    Deletes are SOFT (an ``_deleted`` tombstone flag, mirrored from
    SnapshotTable's ``_deleted`` column, snapshot.py:283): a physical
    DELETE would discard the key's seq watermark, letting any replay the
    ledger misses re-insert the row via the NOT MATCHED arm. With the
    tombstone, the seq guard protects deletes exactly like updates —
    'a late lower-seq update cannot resurrect the row' holds on this
    backend too. ``state()`` filters tombstones out. The applied-epoch
    ledger rides in a table property so a replayed epoch is skipped
    without scanning data; the property update is a separate commit from
    the MERGE, so a crash between the two leaves the epoch applied but
    unledgered — harmless: the replay re-runs the MERGE and every row
    fails the ``seq > _seq`` guard (the ledger is an optimization, the
    guard is the invariant). The read-MERGE-SET property sequence is not
    atomic across WRITERS: concurrent writers to one table need an
    external lock (single-writer is the documented requirement, same as
    the filesystem backend's manifest swap)."""

    def __init__(self, spark: SparkSession, ident: str, key_col: str = "doc_id"):
        self.spark = spark
        self.ident = ident
        self.key_col = key_col

    # -- ledger ------------------------------------------------------
    def committed_epochs(self) -> set[str]:
        # empty ONLY for a not-yet-created table; a transient metadata
        # read failure must PROPAGATE — swallowing it here would make
        # merge_epoch later overwrite the property with a one-epoch
        # ledger, erasing the replay gate for every prior epoch
        if not self.exists():
            return set()
        # SHOW TBLPROPERTIES is the documented Spark SQL surface for
        # Iceberg table properties — the metadata tables
        # (<tbl>.snapshots/.files/...) include no `properties` relation,
        # so a SELECT against it raises on a real runtime. Read the full
        # (key, value) listing and filter client-side: the single-key
        # form's behavior for an UNSET key differs across Spark
        # versions (v1 returns a message row, v2 an empty result).
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {_q(self.ident)}"
        ).collect()
        for r in rows:
            if r["key"] == EPOCHS_PROP:
                return set(json.loads(r["value"]))
        return set()

    def has_epoch(self, epoch_id: str) -> bool:
        return str(epoch_id) in self.committed_epochs()

    # -- reads -------------------------------------------------------
    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def state(self) -> DataFrame:
        # NULL-safe tombstone filter: rows that predate the _deleted
        # column (pre-migration tables backfilled by _ensure_columns)
        # carry NULL and are live, not filtered
        return (
            self.spark.table(self.ident)
            .filter(~F.coalesce(F.col(DEL_COL), F.lit(False)))
            .drop(SEQ_COL, DEL_COL)
        )

    def _ensure_columns(self) -> None:
        """Migration for tables created by earlier engine versions (or
        externally) without the internal ``_seq``/``_deleted`` columns:
        ADD COLUMNS is a metadata-only Iceberg operation; existing rows
        read NULL, which the merge guard and state() treat as 'no
        watermark' / 'live' respectively."""
        have = {f.name for f in self.spark.table(self.ident).schema.fields}
        missing = []
        if SEQ_COL not in have:
            missing.append(f"`{SEQ_COL}` BIGINT")
        if DEL_COL not in have:
            missing.append(f"`{DEL_COL}` BOOLEAN")
        if missing:
            self.spark.sql(
                f"ALTER TABLE {_q(self.ident)} ADD COLUMNS"
                f" ({', '.join(missing)})"
            )

    # -- merge -------------------------------------------------------
    def _reduce(self, batch: DataFrame) -> DataFrame:
        """Key-local dedup + LWW: one row per key, winner by (seq, then
        op+payload hash as the deterministic equal-seq tie-break —
        mirrors SnapshotTable's total order so both backends pick the
        same winners on pathological inputs)."""
        payload = [c for c in batch.columns if c not in ("op", "seq")]
        # EXACTLY snapshot.py's merge tie hash (raw non-key columns +
        # op, same xxhash64 seed chain): the two backends must compute
        # the same total order so they commit identical winners for the
        # same pathological equal-seq batch
        tie = F.xxhash64(
            *[F.col(c) for c in payload if c != self.key_col], F.col("op")
        )
        w_cols = [c for c in batch.columns if c != self.key_col]
        return (
            batch.groupBy(self.key_col)
            .agg(
                F.max_by(
                    F.struct(*w_cols), F.struct(F.col("seq"), tie)
                ).alias("w")
            )
            .select(self.key_col, *[F.col(f"w.{c}").alias(c) for c in w_cols])
        )

    def merge_epoch(self, batch: DataFrame, epoch_id: str) -> dict:
        """Apply one change batch (columns: op/seq/payload...) as one
        Iceberg MERGE. Replaying a committed epoch is a no-op (ledger
        check), and even without the ledger the ``seq > _seq`` guard
        makes the MERGE itself idempotent."""
        epoch_id = str(epoch_id)
        ledger = self.committed_epochs()
        if epoch_id in ledger:
            return {"epoch_id": epoch_id, "skipped": True}
        reduced = self._reduce(batch)
        payload = [
            c for c in reduced.columns if c not in ("op", "seq")
        ]
        if not self.exists():
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in reduced.schema.fields
                if f.name in payload
            )
            self.spark.sql(
                f"CREATE TABLE {_q(self.ident)} ({cols},"
                f" `{SEQ_COL}` BIGINT, `{DEL_COL}` BOOLEAN)"
                f" USING iceberg"
            )
        else:
            self._ensure_columns()
        reduced.createOrReplaceTempView("__merge_batch")
        # deletes are soft (the UPDATE arm sets the tombstone flag) and
        # delete-of-unseen-key INSERTS a tombstone row — both keep the
        # key's seq watermark, exactly like SnapshotTable's merge
        # (snapshot.py: 'deletes are NOT dropped: they persist as
        # tombstone rows'), so a replayed or late lower-seq update can
        # never resurrect a deleted row. _seq/_deleted ride in every
        # arm, so set_clause is never empty even for a key-only schema.
        set_clause = ", ".join(
            [f"t.`{c}` = b.`{c}`" for c in payload if c != self.key_col]
            + [
                f"t.`{SEQ_COL}` = b.seq",
                f"t.`{DEL_COL}` = (b.op = 'delete')",
            ]
        )
        ins_cols = (
            ", ".join(f"`{c}`" for c in payload)
            + f", `{SEQ_COL}`, `{DEL_COL}`"
        )
        ins_vals = (
            ", ".join(f"b.`{c}`" for c in payload)
            + ", b.seq, (b.op = 'delete')"
        )
        self.spark.sql(
            f"""
            MERGE INTO {_q(self.ident)} t
            USING __merge_batch b
            ON t.`{self.key_col}` = b.`{self.key_col}`
            WHEN MATCHED AND b.seq > COALESCE(t.`{SEQ_COL}`, -1)
              THEN UPDATE SET {set_clause}
            WHEN NOT MATCHED
              THEN INSERT ({ins_cols}) VALUES ({ins_vals})
            """
        )
        ledger.add(epoch_id)
        # single-quote escaping ('' is the SQL literal escape): an epoch
        # id containing a quote must not break — or inject into — the
        # statement AFTER the data was already merged
        prop_val = json.dumps(sorted(ledger)).replace("'", "''")
        self.spark.sql(
            f"ALTER TABLE {_q(self.ident)} SET TBLPROPERTIES"
            f" ('{EPOCHS_PROP}' = '{prop_val}')"
        )
        return {"epoch_id": epoch_id, "skipped": False}

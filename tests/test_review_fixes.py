"""Regression tests for the round-5 self-review findings (see commit):
CDF across schema evolution, signed-hash sampling skew, delete_keys
tombstone watermark, reversed CDF spans, index-key aliasing, the
manifest-recorded dir sizes behind the CDF narrowing gate, and
rebucket's handle consistency on generic failure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.functions import curation as cur
from aws_serverless_elt_pipeline_enterprise_spark.operators.secondary_index import (
    SecondaryIndex,
)
from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import SnapshotTable


def _batch(spark, rows, ddl="op string, doc_id string, seq long, v double"):
    return spark.createDataFrame(rows, ddl)


def _mk(spark, tmp_path, mode="mor"):
    return SnapshotTable(
        spark, str(tmp_path / "t"), key_col="doc_id", n_buckets=4, mode=mode
    )


def test_changes_across_schema_evolution_span(spark, tmp_path):
    """A column added INSIDE the diff span must resolve as NULL on the
    before side, not crash side() with UNRESOLVED_COLUMN."""
    t = _mk(spark, tmp_path)
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")
    v0 = t.current_version()
    t.merge_reduced(
        _batch(
            spark,
            [("update", "a", 2, 2.0, 7), ("insert", "b", 3, 3.0, 8)],
            "op string, doc_id string, seq long, v double, w long",
        ),
        "e1",
    )
    rows = {
        (r["doc_id"], r["_change_type"]): (r["v"], r["w"])
        for r in t.changes(v0, t.current_version()).collect()
    }
    assert rows == {("a", "update"): (2.0, 7), ("b", "insert"): (3.0, 8)}
    # the 'both' encoding resolves the pre-image's missing column to NULL
    pre = [
        r
        for r in t.changes(v0, t.current_version(), images="both").collect()
        if r["_change_type"] == "update_preimage"
    ]
    assert len(pre) == 1 and pre[0]["w"] is None and pre[0]["v"] == 1.0


def test_changes_rejects_reversed_span(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")
    t.merge_reduced(_batch(spark, [("update", "a", 2, 2.0)]), "e1")
    with pytest.raises(ValueError, match="v_from"):
        t.changes(t.current_version(), t.current_version() - 1)


def test_stratified_sample_xxhash64_rates_are_unbiased(spark):
    """Signed % on xxhash64 put u in (-1,1): every negative-hash row
    passed the keep test, so rate 0.25 kept ~62%. pmod fixes it."""
    df = spark.range(4000).select(
        F.concat(F.lit("k"), F.col("id")).alias("doc_id"),
        F.lit("s").alias("source"),
    )
    kept = cur.stratified_sample(df, {"s": 0.25}, hash_mode="xxhash64").count()
    assert 800 <= kept <= 1200  # ~25%, not ~62%
    # rate 1.0 emits exactly one copy per row
    assert cur.stratified_sample(df, {"s": 1.0}, hash_mode="xxhash64").count() == 4000
    # portable mode (the oracle's) is already non-negative: unchanged
    kept_p = cur.stratified_sample(df, {"s": 0.25}, hash_mode="portable").count()
    assert 800 <= kept_p <= 1200


def test_delete_keys_tombstone_beats_late_pre_erasure_events(spark, tmp_path):
    """The tombstone rides the TABLE-GLOBAL watermark: a late-replayed
    event with seq above the key's stored max but below the table's max
    (logically pre-erasure) must NOT resurrect the erased key."""
    t = _mk(spark, tmp_path)
    t.merge_reduced(_batch(spark, [("insert", "victim", 5, 1.0)]), "e0")
    t.merge_reduced(_batch(spark, [("insert", "other", 100, 2.0)]), "e1")
    t.delete_keys(["victim"], "gdpr-1")
    # late event at seq 50: below the table watermark at erasure time
    t.merge_reduced(_batch(spark, [("update", "victim", 50, 9.0)]), "late")
    state = {r["doc_id"]: r["v"] for r in t.state().collect()}
    assert state == {"other": 2.0}  # victim stays erased
    # a GENUINELY later event (above the erasure watermark) starts a new
    # life for the key — same contract as delete_where
    t.merge_reduced(_batch(spark, [("insert", "victim", 200, 3.0)]), "new")
    assert {r["doc_id"]: r["v"] for r in t.state().collect()} == {
        "other": 2.0,
        "victim": 3.0,
    }


def test_secondary_index_value_containing_separator(spark, tmp_path):
    """Index keys are length-prefixed: values containing the 0x1f
    separator can no longer alias two distinct (value, doc) pairs."""
    t = _mk(spark, tmp_path)
    ix = SecondaryIndex(spark, t, str(tmp_path / "ix"), "color", n_buckets=4)
    # the classic aliasing pair: ('a\x1fb', 'c') vs ('a', 'b\x1fc')
    t.merge_reduced(
        _batch(
            spark,
            [("insert", "c", 1, "a\x1fb"), ("insert", "b\x1fc", 2, "a")],
            "op string, doc_id string, seq long, color string",
        ),
        "e0",
    )
    ix.refresh()
    assert {r["doc_id"] for r in ix.lookup(["a\x1fb"]).collect()} == {"c"}
    assert {r["doc_id"] for r in ix.lookup(["a"]).collect()} == {"b\x1fc"}
    # two distinct index entries exist (no LWW collapse)
    assert ix.idx.state().count() == 2


def test_manifest_records_dir_bytes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")
    t.merge_reduced(_batch(spark, [("insert", "b", 2, 2.0)]), "e1")
    m = t.manifest()
    live = {d for dirs in m["buckets"].values() for d in dirs} | set(
        m["global_deltas"]
    )
    assert set(m["dir_bytes"]) == live
    assert all(v > 0 for v in m["dir_bytes"].values())
    # compaction carries sizes for the new dir, drops the folded ones
    t.compact()
    m2 = t.manifest()
    assert set(m2["dir_bytes"]) == {
        d for dirs in m2["buckets"].values() for d in dirs
    }


def test_rebucket_restores_count_on_generic_failure(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")

    def boom(*a, **kw):
        raise RuntimeError("disk full")

    t._commit_manifest = boom
    with pytest.raises(RuntimeError, match="disk full"):
        t.rebucket(16)
    assert t.n_buckets == 4  # handle still matches the on-disk table

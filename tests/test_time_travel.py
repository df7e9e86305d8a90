"""Timestamp time travel: SnapshotTable.version_at / state_at /
changes_between (Delta timestampAsOf / Iceberg FOR SYSTEM_TIME AS OF
analogue). Commit timestamps live only in manifests, are injectable
via SnapshotTable(clock=), and are monotone-corrected at write."""

from __future__ import annotations

import pytest

from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import SnapshotTable


def _batch(spark, rows):
    return spark.createDataFrame(rows, "op string, doc_id string, seq long, v double")


def _mk(spark, tmp_path, ticks):
    it = iter(ticks)
    return SnapshotTable(
        spark,
        str(tmp_path / "t"),
        key_col="doc_id",
        n_buckets=4,
        mode="mor",
        clock=lambda: next(it),
    )


def test_version_at_resolves_commit_timestamps(spark, tmp_path):
    t = _mk(spark, tmp_path, [1.0, 2.0, 3.0])
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")  # ts 1000
    t.merge_reduced(_batch(spark, [("update", "a", 2, 2.0)]), "e1")  # ts 2000
    t.merge_reduced(_batch(spark, [("delete", "a", 3, 0.0)]), "e2")  # ts 3000
    v0, v2 = t.current_version() - 2, t.current_version()
    assert t.version_at(999) is None
    assert t.version_at(1000) == v0  # boundary is inclusive (<=)
    assert t.version_at(1500) == v0
    assert t.version_at(2000) == v0 + 1
    assert t.version_at(10_000) == v2  # future ts -> latest

    assert [r["v"] for r in t.state_at(1500).collect()] == [1.0]
    assert [r["v"] for r in t.state_at(2500).collect()] == [2.0]
    assert t.state_at(3000).count() == 0  # deleted
    with pytest.raises(ValueError):
        t.state_at(500)


def test_commit_timestamps_are_monotone_under_frozen_clock(spark, tmp_path):
    # a stuck clock (or skewed NTP step backwards) must never produce a
    # later version with an earlier-or-equal timestamp
    t = SnapshotTable(
        spark,
        str(tmp_path / "t"),
        key_col="doc_id",
        n_buckets=4,
        mode="mor",
        clock=lambda: 5.0,
    )
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")
    t.merge_reduced(_batch(spark, [("insert", "b", 2, 2.0)]), "e1")
    t.merge_reduced(_batch(spark, [("insert", "c", 3, 3.0)]), "e2")
    ts = [
        t.manifest(v)["committed_at_ms"]
        for v in range(t.current_version() - 2, t.current_version() + 1)
    ]
    assert ts[0] == 5000 and ts == sorted(set(ts)), ts


def test_version_at_past_retention_horizon_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, [float(i) for i in range(1, 40)])
    for i in range(12):
        t.merge_reduced(_batch(spark, [("insert", f"k{i}", i, float(i))]), f"e{i}")
    t.expire_snapshots(keep_last=3)
    # ts 1000 resolved to the (now expired) first version
    with pytest.raises(ValueError, match="retention"):
        t.version_at(1000)
    # recent ts still resolves
    assert t.version_at(1_000_000) == t.current_version()


def test_changes_between_timestamps(spark, tmp_path):
    t = _mk(spark, tmp_path, [1.0, 2.0, 3.0])
    t.merge_reduced(
        _batch(spark, [("insert", "a", 1, 1.0), ("insert", "b", 2, 2.0)]), "e0"
    )
    t.merge_reduced(
        _batch(spark, [("update", "a", 3, 10.0), ("insert", "c", 4, 4.0)]), "e1"
    )
    t.merge_reduced(_batch(spark, [("delete", "b", 5, 0.0)]), "e2")
    # span before the first commit: everything visible at ts_to is an insert
    rows = sorted(
        (r["doc_id"], r["_change_type"]) for r in t.changes_between(0, 2500).collect()
    )
    assert rows == [("a", "insert"), ("b", "insert"), ("c", "insert")]
    # interior span: a updated, b deleted, c inserted; a key changed and
    # reverted WITHIN the span would net out (visible-state diff)
    rows = sorted(
        (r["doc_id"], r["_change_type"])
        for r in t.changes_between(1500, 3500).collect()
    )
    assert rows == [("a", "update"), ("b", "delete"), ("c", "insert")]
    with pytest.raises(ValueError):
        t.changes_between(0, 500)

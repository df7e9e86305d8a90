"""CdfExporter: exactly-once span-directory export of the change feed."""

from __future__ import annotations

import os
import shutil

from aws_serverless_elt_pipeline_enterprise_spark.operators.cdf_export import CdfExporter
from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import SnapshotTable


def _batch(spark, rows):
    return spark.createDataFrame(rows, "op string, doc_id string, seq long, v double")


def _mk(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), key_col="doc_id", n_buckets=4, mode="mor"
    )
    return t, CdfExporter(spark, t, str(tmp_path / "out"))


def _spans(dest):
    return sorted(d for d in os.listdir(dest) if d.startswith("span="))


def test_export_publishes_chained_spans(spark, tmp_path):
    t, ex = _mk(spark, tmp_path)
    t.merge_reduced(
        _batch(spark, [("insert", "a", 1, 1.0), ("insert", "b", 2, 2.0)]), "e0"
    )
    r1 = ex.export()
    assert r1["bootstrapped"] is False and r1["rows"] == 2
    t.merge_reduced(
        _batch(spark, [("update", "a", 3, 10.0), ("delete", "b", 4, 0.0)]), "e1"
    )
    r2 = ex.export()
    assert r2["from_version"] == r1["to_version"]
    names = _spans(ex.dest)
    assert names[0].startswith("span=init_v") and names[1].startswith(
        f"span=v{r1['to_version']:06d}_v"
    )
    rows = sorted(
        (r["doc_id"], r["_change_type"], r["v"])
        for r in spark.read.parquet(r2["span_dir"]).collect()
    )
    assert rows == [("a", "update", 10.0), ("b", "delete", 2.0)]
    # no-op when the source hasn't advanced
    r3 = ex.export()
    assert r3["span_dir"] is None and _spans(ex.dest) == names


def test_export_crash_between_rename_and_bookmark_is_exactly_once(spark, tmp_path):
    t, ex = _mk(spark, tmp_path)
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")
    ex.export()
    t.merge_reduced(_batch(spark, [("update", "a", 2, 2.0)]), "e1")
    r = ex.export()
    # simulate the crash: the span dir was published but the bookmark
    # write was lost
    os.remove(ex._bookmark_path())
    # worse: the source advances before the retry
    t.merge_reduced(_batch(spark, [("update", "a", 3, 3.0)]), "e2")
    r2 = ex.export()
    # the retry fast-forwarded from the published listing: it starts at
    # the crashed span's END, never re-publishing (a,2.0)
    assert r2["from_version"] == r["to_version"]
    spans = _spans(ex.dest)
    assert len(spans) == 3
    rows = sorted(
        (r_["doc_id"], r_["v"]) for r_ in spark.read.parquet(r2["span_dir"]).collect()
    )
    assert rows == [("a", 3.0)]


def test_export_skips_already_published_span(spark, tmp_path):
    t, ex = _mk(spark, tmp_path)
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")
    r = ex.export()
    os.remove(ex._bookmark_path())
    # source did NOT advance: retry resolves to the same span, which is
    # already on disk -> recognized via fast-forward as a no-op
    r2 = ex.export()
    assert r2["span_dir"] is None and r2["to_version"] == r["to_version"]
    assert len(_spans(ex.dest)) == 1


def test_export_bootstraps_past_retention_horizon(spark, tmp_path):
    t, ex = _mk(spark, tmp_path)
    for i in range(10):
        t.merge_reduced(_batch(spark, [("insert", f"k{i}", i, float(i))]), f"e{i}")
    ex.export()
    # consumer falls behind: 10 more epochs land and the old versions
    # (incl. the bookmark) are expired
    for i in range(10, 20):
        t.merge_reduced(_batch(spark, [("insert", f"k{i}", i, float(i))]), f"e{i}")
    t.expire_snapshots(keep_last=2)
    r = ex.export()
    assert r["bootstrapped"] is True
    assert os.path.basename(r["span_dir"]).startswith("span=boot_v")
    got = spark.read.parquet(r["span_dir"])
    assert got.count() == 20  # full state, replace-not-patch
    assert set(r_["_change_type"] for r_ in got.collect()) == {"insert"}
    # and the chain continues from the bootstrap
    t.merge_reduced(_batch(spark, [("update", "k0", 100, 99.0)]), "e20")
    r2 = ex.export()
    assert r2["from_version"] == r["to_version"] and r2["rows"] == 1


def test_export_fastforward_survives_bootstrap_crash(spark, tmp_path):
    t, ex = _mk(spark, tmp_path)
    for i in range(8):
        t.merge_reduced(_batch(spark, [("insert", f"k{i}", i, float(i))]), f"e{i}")
    ex.export()
    for i in range(8, 12):
        t.merge_reduced(_batch(spark, [("insert", f"k{i}", i, float(i))]), f"e{i}")
    t.expire_snapshots(keep_last=2)
    r = ex.export()
    assert r["bootstrapped"] is True
    os.remove(ex._bookmark_path())  # crash after boot publish
    r2 = ex.export()  # must fast-forward past the boot dir, not re-boot
    assert r2["span_dir"] is None and r2["to_version"] == r["to_version"]
    assert sum(1 for d in _spans(ex.dest) if d.startswith("span=boot")) == 1


def test_export_images_both_carries_pre_and_post(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), key_col="doc_id", n_buckets=4, mode="mor"
    )
    ex = CdfExporter(spark, t, str(tmp_path / "out"), images="both")
    t.merge_reduced(_batch(spark, [("insert", "a", 1, 1.0)]), "e0")
    ex.export()
    t.merge_reduced(_batch(spark, [("update", "a", 2, 2.0)]), "e1")
    r = ex.export()
    rows = sorted(
        (r_["_change_type"], r_["v"])
        for r_ in spark.read.parquet(r["span_dir"]).collect()
    )
    assert rows == [("update_postimage", 2.0), ("update_preimage", 1.0)]

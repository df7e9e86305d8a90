"""CdfExporter: exactly-once span-directory export of the change feed."""

from __future__ import annotations

import os

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


def test_run_replay_exports_spans_in_lockstep(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (
        run_replay,
    )

    log = str(tmp_path / "log")
    generate_changelog(
        spark, log, ChangelogSpec(n_events=3000, n_keys=200, n_batches=3)
    )
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), key_col="doc_id", n_buckets=8, mode="mor"
    )
    ex = CdfExporter(spark, t, str(tmp_path / "out"))
    run_replay(spark, log, t, maintain=[ex])
    spans = _spans(ex.dest)
    assert len(spans) == 3  # one published span per applied epoch
    # replaying the whole outbox (LWW over every span) rebuilds the
    # exact final state a downstream consumer would hold
    feed = spark.read.parquet(*[str(tmp_path / "out" / s) for s in spans])
    winner = (
        feed.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("_change_type", *[c for c in feed.columns
                                           if c not in ("doc_id", "_seq", "_change_type")]),
                F.col("_seq"),
            ).alias("w")
        )
        .filter(F.col("w._change_type") != "delete")
    )
    assert winner.count() == t.state().count()
    # idempotent rerun: every epoch skips, no new spans
    run_replay(spark, log, t, maintain=[ex])
    assert _spans(ex.dest) == spans


def test_expire_bounds_outbox_and_orphaned_recovery_boots(spark, tmp_path):
    t, ex = _mk(spark, tmp_path)
    for i in range(6):
        t.merge_reduced(_batch(spark, [("insert", f"k{i}", i, float(i))]), f"e{i}")
        ex.export()
    assert len(_spans(ex.dest)) == 6
    dropped = ex.expire(keep_last=2)
    assert len(dropped) == 4 and len(_spans(ex.dest)) == 2
    # normal operation continues off the durable bookmark
    t.merge_reduced(_batch(spark, [("update", "k0", 100, 9.0)]), "e6")
    r = ex.export()
    assert r["rows"] == 1 and not r["bootstrapped"]
    # bookmark lost AND chain head expired: the listing can no longer
    # prove what was published -> re-enter via the boot contract
    ex.expire(keep_last=1)
    os.remove(ex._bookmark_path())
    r2 = ex.export()
    assert r2["bootstrapped"] is True
    assert os.path.basename(r2["span_dir"]).startswith("span=boot_v")
    assert spark.read.parquet(r2["span_dir"]).count() == 6  # full state


def test_streaming_replay_maintains_views_and_outbox(spark, tmp_path):
    """run_replay_streaming(maintain=[...]): views and the outbox ride
    each micro-batch; a resumed run with no new files still catches up
    a late-attached view via the end-of-pass refresh."""
    from pyspark.sql import functions as F

    from aws_serverless_elt_pipeline_enterprise_spark.operators.incremental_agg import (
        MaterializedAggregate,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (
        run_replay_streaming,
    )

    log = str(tmp_path / "log")
    generate_changelog(
        spark, log, ChangelogSpec(n_events=3000, n_keys=200, n_batches=3)
    )
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), key_col="doc_id", n_buckets=8, mode="mor"
    )
    ma = MaterializedAggregate(spark, t, str(tmp_path / "mv"), ["source"])
    ex = CdfExporter(spark, t, str(tmp_path / "out"))
    run_replay_streaming(
        spark, log, t, checkpoint_dir=str(tmp_path / "ck"), maintain=[ma, ex]
    )
    expect = {
        r["source"]: r["cnt"]
        for r in t.state().groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert {r["source"]: r["cnt"] for r in ma.result().collect()} == expect
    assert len(_spans(ex.dest)) >= 1  # outbox published
    # the outbox alone rebuilds the table's row count
    feed = spark.read.parquet(*[str(tmp_path / "out" / s) for s in _spans(ex.dest)])
    alive = (
        feed.groupBy("doc_id")
        .agg(F.max_by("_change_type", "_seq").alias("ct"))
        .filter(F.col("ct") != "delete")
    )
    assert alive.count() == t.state().count()
    # resume with NO new files + a late-attached view: catch-up pass
    ma2 = MaterializedAggregate(spark, t, str(tmp_path / "mv2"), ["source"])
    run_replay_streaming(
        spark, log, t, checkpoint_dir=str(tmp_path / "ck"), maintain=[ma2]
    )
    assert {r["source"]: r["cnt"] for r in ma2.result().collect()} == expect

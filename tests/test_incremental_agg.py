"""Incremental aggregate maintenance: changes(images='both') and
MaterializedAggregate (operators/incremental_agg.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.operators.incremental_agg import (
    MaterializedAggregate,
)
from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import SnapshotTable


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, doc_id string, seq long, grp string, val long"
    )


def _mk(spark, tmp_path, n_buckets=8):
    return SnapshotTable(
        spark, str(tmp_path / "src"), key_col="doc_id", n_buckets=n_buckets, mode="mor"
    )


def _recompute(t: SnapshotTable):
    """Ground truth: full recompute over the current visible state."""
    return {
        (r["grp"],): (r["cnt"], r["sum_val"])
        for r in t.state()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("val").alias("sum_val"),
        )
        .collect()
    }


def _materialized(ma: MaterializedAggregate):
    return {
        (r["grp"],): (r["cnt"], r["sum_val"]) for r in ma.result().collect()
    }


# ---------------------------------------------------------------- images=both


def test_changes_images_both_two_row_update_encoding(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_reduced(
        _batch(spark, [("insert", f"k{i}", i, "a", i * 10) for i in range(1, 4)]),
        "e0",
    )
    v1 = t.current_version()
    t.merge_reduced(
        _batch(
            spark,
            [
                ("update", "k1", 100, "b", 111),  # group move a -> b
                ("delete", "k2", 101, None, None),
                ("insert", "k9", 102, "a", 90),
            ],
        ),
        "e1",
    )
    rows = sorted(
        (r["doc_id"], r["_change_type"], r["grp"], r["val"], r["_seq"])
        for r in t.changes(v1, images="both").collect()
    )
    assert rows == [
        ("k1", "update_postimage", "b", 111, 100),
        ("k1", "update_preimage", "a", 10, 1),
        ("k2", "delete", "a", 20, 2),
        ("k9", "insert", "a", 90, 102),
    ]
    # post-mode and both-mode agree on the changed-key set
    assert {r["doc_id"] for r in t.changes(v1).collect()} == {"k1", "k2", "k9"}
    with pytest.raises(ValueError):
        t.changes(v1, images="full")


# ------------------------------------------------------- maintenance parity


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp"], sums={"sum_val": "val"}
    )
    # epoch 0: bootstrap
    t.merge_reduced(
        _batch(
            spark,
            [("insert", f"k{i}", i, "abc"[i % 3], i) for i in range(12)]
            + [("insert", "knull", 50, "a", None)],  # null sum contribution
        ),
        "e0",
    )
    info = ma.refresh()
    assert info["bootstrapped"] is True
    assert _materialized(ma) == _recompute(t)

    # epoch 1: updates (incl. group move), deletes, inserts, null flips
    t.merge_reduced(
        _batch(
            spark,
            [
                ("update", "k0", 100, "c", 1000),  # a -> c
                ("delete", "k1", 101, None, None),
                ("insert", "k20", 102, "d", 7),  # brand-new group
                ("update", "knull", 103, "a", 5),  # null -> non-null
                ("update", "k3", 104, "a", None),  # non-null -> null
            ],
        ),
        "e1",
    )
    info = ma.refresh()
    assert info["bootstrapped"] is False and "touched_buckets" in info
    assert _materialized(ma) == _recompute(t)

    # epoch 2: empty a group entirely -> tombstoned out of the result
    t.merge_reduced(
        _batch(spark, [("delete", "k20", 200, None, None)]), "e2"
    )
    ma.refresh()
    got = _materialized(ma)
    assert ("d",) not in got
    assert got == _recompute(t)


def test_sum_null_semantics_all_null_group(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp"], sums={"sum_val": "val"}
    )
    t.merge_reduced(
        _batch(spark, [("insert", "x", 1, "g", None), ("insert", "y", 2, "g", None)]),
        "e0",
    )
    ma.refresh()
    [r] = ma.result().collect()
    assert (r["grp"], r["cnt"], r["sum_val"]) == ("g", 2, None)  # SUM() of nulls
    # one non-null arrives incrementally -> SUM becomes defined
    t.merge_reduced(_batch(spark, [("update", "x", 10, "g", 42)]), "e1")
    ma.refresh()
    [r] = ma.result().collect()
    assert (r["cnt"], r["sum_val"]) == (2, 42)


def test_null_group_key_is_its_own_group(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp"], sums={"sum_val": "val"}
    )
    t.merge_reduced(
        _batch(spark, [("insert", "a", 1, None, 5), ("insert", "b", 2, None, 6)]),
        "e0",
    )
    ma.refresh()
    t.merge_reduced(_batch(spark, [("update", "a", 10, None, 7)]), "e1")
    ma.refresh()
    got = {r["grp"]: (r["cnt"], r["sum_val"]) for r in ma.result().collect()}
    assert got == {None: (2, 13)}


# ------------------------------------------------------ exactly-once refresh


def test_refresh_noop_when_caught_up(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(spark, t, str(tmp_path / "mv"), ["grp"])
    t.merge_reduced(_batch(spark, [("insert", "a", 1, "g", 1)]), "e0")
    ma.refresh()
    v = ma.agg.current_version()
    info = ma.refresh()
    assert info.get("noop") is True
    assert ma.agg.current_version() == v  # no new agg commit


def test_stale_bookmark_source_unchanged_no_double_apply(spark, tmp_path):
    """Crash between agg commit and bookmark write, source NOT advanced:
    the re-run recomputes the same span and the ledger skips the merge."""
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp"], sums={"sum_val": "val"}
    )
    t.merge_reduced(
        _batch(spark, [("insert", f"k{i}", i, "g", 1) for i in range(4)]), "e0"
    )
    ma.refresh()
    bm1 = ma._read_bookmark()
    t.merge_reduced(_batch(spark, [("insert", "k9", 100, "g", 1)]), "e1")
    ma.refresh()
    # simulate the crash: rewind the bookmark file to the pre-refresh value
    with open(ma._bookmark_path(), "w") as f:
        json.dump({"last_version": bm1}, f)
    ma.refresh()
    assert _materialized(ma) == _recompute(t) == {("g",): (5, 5)}


def test_stale_bookmark_source_advanced_ledger_fastforward(spark, tmp_path):
    """Crash between agg commit and bookmark write, then MORE source
    commits before the re-run: naively diffing from the stale bookmark
    would double-apply the committed span under a new epoch id. The
    ledger fast-forward must resume from the true (committed) version."""
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp"], sums={"sum_val": "val"}
    )
    t.merge_reduced(
        _batch(spark, [("insert", f"k{i}", i, "g", 1) for i in range(4)]), "e0"
    )
    ma.refresh()
    bm1 = ma._read_bookmark()
    t.merge_reduced(_batch(spark, [("insert", "k9", 100, "g", 1)]), "e1")
    ma.refresh()  # commits epoch cdf-<bm1>-<v2>
    with open(ma._bookmark_path(), "w") as f:
        json.dump({"last_version": bm1}, f)
    # source advances AFTER the crash
    t.merge_reduced(_batch(spark, [("insert", "k10", 200, "g", 1)]), "e2")
    ma.refresh()
    assert _materialized(ma) == _recompute(t) == {("g",): (6, 6)}


def test_expired_horizon_bootstraps_rebuild(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp"], sums={"sum_val": "val"}
    )
    t.merge_reduced(_batch(spark, [("insert", "a", 1, "g", 1)]), "e0")
    ma.refresh()
    for i in range(12):
        t.merge_reduced(
            _batch(spark, [("update", "a", 10 + i, "g", i)]), f"e{i+1}"
        )
    t.compact()
    t.expire_snapshots(keep_last=2)
    info = ma.refresh()
    assert info["bootstrapped"] is True
    assert _materialized(ma) == _recompute(t)


# ------------------------------------------------------------- scale shape


def test_small_refresh_touches_few_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp"], sums={"sum_val": "val"},
        n_buckets=16,
    )
    t.merge_reduced(
        _batch(
            spark,
            [("insert", f"k{i}", i, f"g{i % 64}", 1) for i in range(256)],
        ),
        "e0",
    )
    ma.refresh()
    # one key's update touches exactly one group -> at most 1 agg bucket
    t.merge_reduced(_batch(spark, [("update", "k0", 1000, "g0", 9)]), "e1")
    info = ma.refresh()
    assert len(info["touched_buckets"]) == 1
    assert _materialized(ma)[("g0",)] == _recompute(t)[("g0",)]
    # an update that changes NO maintained aggregate (same group, same
    # value) nets a zero delta -> nothing read, nothing written
    t.merge_reduced(_batch(spark, [("update", "k1", 2000, "g1", 1)]), "e2")
    info = ma.refresh()
    assert info["touched_buckets"] == []
    assert _materialized(ma) == _recompute(t)


def test_composite_group_and_reserved_name_guard(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["grp", "doc_id"]
    )
    t.merge_reduced(
        _batch(spark, [("insert", "a", 1, "g", 1), ("insert", "b", 2, "g", 2)]),
        "e0",
    )
    ma.refresh()
    got = {(r["grp"], r["doc_id"]): r["cnt"] for r in ma.result().collect()}
    assert got == {("g", "a"): 1, ("g", "b"): 1}
    with pytest.raises(ValueError):
        MaterializedAggregate(spark, t, str(tmp_path / "mv2"), ["_group_key"])
    with pytest.raises(ValueError):
        MaterializedAggregate(spark, t, str(tmp_path / "mv3"), [])


# ------------------------------------------------------- replay integration


def test_run_replay_maintains_views_in_lockstep(spark, tmp_path):
    from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (
        run_replay,
    )

    log = str(tmp_path / "log")
    generate_changelog(
        spark, log, ChangelogSpec(n_events=4000, n_keys=300, n_batches=4)
    )
    t = SnapshotTable(
        spark, str(tmp_path / "tbl"), key_col="doc_id", n_buckets=8, mode="mor"
    )
    ma = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["source"], sums={"tok_total": "n_tok"}
    )
    run_replay(spark, log, t, maintain=[ma], compact_every=2)
    expect = {
        r["source"]: (r["cnt"], r["tok"])
        for r in t.state()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_tok").alias("tok"))
        .collect()
    }
    got = {
        r["source"]: (r["cnt"], r["tok_total"]) for r in ma.result().collect()
    }
    assert got == expect and len(got) > 1
    # idempotent rerun: all epochs skip, the catch-up refresh is a no-op
    v = ma.agg.current_version()
    res2 = run_replay(spark, log, t, maintain=[ma])
    assert not res2.epochs_applied
    assert ma.agg.current_version() == v
    assert {
        r["source"]: (r["cnt"], r["tok_total"]) for r in ma.result().collect()
    } == expect
    # a view ATTACHED after the fact catches up via the end-of-run pass
    ma2 = MaterializedAggregate(spark, t, str(tmp_path / "mv2"), ["source"])
    run_replay(spark, log, t, maintain=[ma2])
    assert {r["source"]: r["cnt"] for r in ma2.result().collect()} == {
        s: c for s, (c, _) in expect.items()
    }


def test_run_replay_maintain_every_cadence(spark, tmp_path):
    """maintain_every=K folds K epochs into one span refresh: fewer view
    commits, identical final state (bookmarks are span-based)."""
    from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (
        run_replay,
    )

    log = str(tmp_path / "log")
    generate_changelog(
        spark, log, ChangelogSpec(n_events=6000, n_keys=400, n_batches=6)
    )

    def run(k: int, tag: str):
        t = SnapshotTable(
            spark, str(tmp_path / f"tbl{tag}"), key_col="doc_id",
            n_buckets=8, mode="mor",
        )
        ma = MaterializedAggregate(spark, t, str(tmp_path / f"mv{tag}"), ["source"])
        run_replay(spark, log, t, maintain=[ma], maintain_every=k)
        return t, ma

    t1, m1 = run(1, "a")
    t3, m3 = run(3, "b")
    want = {r["source"]: r["cnt"] for r in t1.state().groupBy("source").count().withColumnRenamed("count", "cnt").collect()}
    assert {r["source"]: r["cnt"] for r in m1.result().collect()} == want
    assert {r["source"]: r["cnt"] for r in m3.result().collect()} == want
    # K=3 over 6 epochs: 2 in-loop refreshes + final no-op catch-up;
    # K=1: 6 in-loop refreshes. The agg table's version count shows it.
    assert m3.agg.current_version() < m1.agg.current_version()

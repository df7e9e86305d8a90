"""Bucket-pruned point lookups + streaming checkpoint resume."""

from __future__ import annotations

import os
import shutil

from aws_serverless_elt_pipeline_enterprise_spark.quality.verify import states_equal
from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    list_batches,
)
from aws_serverless_elt_pipeline_enterprise_spark.streaming.metrics import (
    LineageListener,
)
from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (
    run_replay,
    run_replay_streaming,
)
from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import SnapshotTable


def test_point_lookup_bucket_pruned(spark, tmp_path):
    spec = ChangelogSpec(n_events=6_000, n_keys=500, n_batches=4, seed=51)
    log = str(tmp_path / "log")
    generate_changelog(spark, log, spec)
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=16, mode="mor")
    run_replay(spark, log, table)
    table.compact()
    full = {r.doc_id: r.tokens for r in table.state().collect()}
    some = sorted(full)[:5]
    got = {r.doc_id: r.tokens for r in table.lookup(some).collect()}
    assert got == {k: full[k] for k in some}
    # a deleted/absent key returns nothing
    assert table.lookup(["doc_nonexistent"]).count() == 0


def test_streaming_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a second availableNow run with the
    same checkpoint processes ONLY files added since the first run, and
    the final state equals a clean batch replay of everything."""
    spec = ChangelogSpec(n_events=8_000, n_keys=600, n_batches=6, seed=53)
    staging = str(tmp_path / "staging")
    generate_changelog(spark, staging, spec)
    live = str(tmp_path / "live")
    os.makedirs(live)
    batches = list_batches(staging)
    for p in batches[:3]:
        shutil.copytree(p, os.path.join(live, os.path.basename(p)))

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8, mode="mor")
    ck = str(tmp_path / "ck")
    l1 = LineageListener()
    spark.streams.addListener(l1)
    try:
        run_replay_streaming(spark, live, table, checkpoint_dir=ck)
    finally:
        spark.streams.removeListener(l1)
    rows_first = sum(p["num_input_rows"] for p in l1.progress)
    assert 0 < rows_first < spec.n_events

    for p in batches[3:]:
        shutil.copytree(p, os.path.join(live, os.path.basename(p)))
    l2 = LineageListener()
    spark.streams.addListener(l2)
    try:
        run_replay_streaming(spark, live, table, checkpoint_dir=ck)
    finally:
        spark.streams.removeListener(l2)
    rows_second = sum(p["num_input_rows"] for p in l2.progress)
    assert rows_first + rows_second == spec.n_events, (
        "resume must process exactly the new files, nothing twice"
    )

    t_batch = SnapshotTable(spark, str(tmp_path / "tb"), n_buckets=8, mode="mor")
    run_replay(spark, staging, t_batch)
    assert states_equal(table.state(), t_batch.state())

"""Per-epoch stage decomposition of the replay job at one parallelism
level (VERDICT r4 #4): how much of an epoch's wall is the distributed
write job vs serial driver work (parquet footer reads, manifest IO,
ledger/manifest JSON loads, epoch-loop bookkeeping). Run at local[2] and
local[8] on the SAME cached input to see which slices scale.

Usage: python scripts/profile_replay_epoch.py [cpus] [n_events]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot as S  # noqa: E402
from aws_serverless_elt_pipeline_enterprise_spark.benchkit import (  # noqa: E402
    changelog_cache_ready,
    sweep_stale_tables,
    work_root,
)
from aws_serverless_elt_pipeline_enterprise_spark.session import get_spark  # noqa: E402
from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (  # noqa: E402
    ChangelogSpec,
    generate_changelog,
)
from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (  # noqa: E402
    apply_epoch,
    list_batches,
)

ACC = {"footers": 0.0, "manifest_io": 0.0, "manifest_reads": 0.0}


def _timed(d: dict, key: str, fn):
    def wrap(*a, **k):
        t0 = time.monotonic()
        try:
            return fn(*a, **k)
        finally:
            d[key] += time.monotonic() - t0

    return wrap


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000_000
    # instrument the serial driver slices
    S._partition_rows = _timed(ACC, "footers", S._partition_rows)
    S.SnapshotTable._commit_manifest = _timed(
        ACC, "manifest_io", S.SnapshotTable._commit_manifest
    )
    S.SnapshotTable.manifest = _timed(ACC, "manifest_reads", S.SnapshotTable.manifest)

    extra = {}
    if work_root().startswith("/dev/shm"):
        os.makedirs("/dev/shm/spark_graft_bench/local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark_graft_bench/local"
    spark = get_spark(
        app_name="replay-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
        extra_conf=extra,
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spec = ChangelogSpec(
        n_events=n_events, n_keys=max(n_events // 10, 100), n_batches=8, seed=42
    )
    cache = f"{work_root()}/log_{n_events}_{spec.n_keys}_{spec.n_batches}"
    if not changelog_cache_ready(cache, spec.n_batches):
        shutil.rmtree(cache, ignore_errors=True)
        generate_changelog(spark, cache, spec)
    sweep_stale_tables(work_root())
    tbl_dir = f"{work_root()}/tbl_{os.getpid()}"
    shutil.rmtree(tbl_dir, ignore_errors=True)
    table = S.SnapshotTable(spark, tbl_dir, n_buckets=32, mode="mor")
    spark.read.parquet(os.path.join(cache, "batch_00000")).limit(1000).count()

    t_total0 = time.monotonic()
    t_read = t_apply = 0.0
    for path in list_batches(cache):
        t0 = time.monotonic()
        events = spark.read.parquet(path)
        t_read += time.monotonic() - t0
        t0 = time.monotonic()
        apply_epoch(table, events, os.path.basename(path))
        t_apply += time.monotonic() - t0
    t0 = time.monotonic()
    table.compact()
    t_compact = time.monotonic() - t0
    t0 = time.monotonic()
    n_rows = table.state().count()
    t_count = time.monotonic() - t0
    total = time.monotonic() - t_total0
    shutil.rmtree(tbl_dir, ignore_errors=True)

    serial = ACC["footers"] + ACC["manifest_io"] + ACC["manifest_reads"]
    out = {
        "cpus": cpus,
        "events": n_events,
        "total_wall": round(total, 3),
        "events_per_sec": round(n_events / total, 1),
        "final_rows": n_rows,
        "epoch_read_plan": round(t_read, 3),
        "epoch_apply": round(t_apply, 3),
        "compact": round(t_compact, 3),
        "state_count": round(t_count, 3),
        "serial_footers": round(ACC["footers"], 3),
        "serial_manifest_io": round(ACC["manifest_io"], 3),
        "serial_manifest_reads": round(ACC["manifest_reads"], 3),
        "serial_total": round(serial, 3),
        "serial_pct_of_wall": round(100 * serial / total, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Sustained-load replay evidence (VERDICT round 2, item 10).

Replays a large change log (default 2x10^8 events, 32 epochs) with the
production maintenance policy IN the loop — ``maybe_compact(max_deltas=8)``
after every epoch — and reports:

  * steady-state throughput (events/sec over the whole timed window,
    minor compactions included — the cost a real deployment pays);
  * per-epoch wall times for the first vs second half (a growing ratio
    would mean compaction does NOT keep per-epoch cost flat);
  * the maximum delta-chain depth ever observed (read amplification
    bound: asserted <= max_deltas).

The final full compact + state count closes the loop (exact final rows).
Appends a markdown row to BENCH.md and prints one JSON line.

Usage: python scripts/bench_sustained.py [n_events] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_serverless_elt_pipeline_enterprise_spark.benchkit import (  # noqa: E402
    changelog_cache_ready,
    sweep_stale_tables,
)
from aws_serverless_elt_pipeline_enterprise_spark.session import get_spark  # noqa: E402
from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (  # noqa: E402
    ChangelogSpec,
    generate_changelog,
    list_batches,
)
from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (  # noqa: E402
    apply_epoch,
)
from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import (  # noqa: E402
    SnapshotTable,
)

MAX_DELTAS = 8


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    work = "/dev/shm/spark_graft_sustained"
    os.makedirs(os.path.join(work, "local"), exist_ok=True)
    spark = get_spark(
        app_name="cdc-sustained",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 4,
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    # replay stages are fixed-shape; AQE re-planning is driver overhead here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spec = ChangelogSpec(
        n_events=n_events,
        n_keys=max(n_events // 10, 100),
        n_batches=n_batches,
        seed=42,
    )
    log = os.path.join(work, f"log_{n_events}_{spec.n_keys}_{n_batches}")
    if not changelog_cache_ready(log, n_batches):
        shutil.rmtree(log, ignore_errors=True)
        generate_changelog(spark, log, spec)
    sweep_stale_tables(work)
    tbl = os.path.join(work, f"tbl_{os.getpid()}")
    shutil.rmtree(tbl, ignore_errors=True)
    # any failure path (gate ValueError, depth assert, OOM) must still
    # reclaim the multi-GB table dir — atexit covers every exit without
    # try/finally indentation; the pid sweep above is the kill -9 backstop
    import atexit

    atexit.register(shutil.rmtree, tbl, ignore_errors=True)
    table = SnapshotTable(spark, tbl, n_buckets=32, mode="mor")
    # JVM/codegen warmup outside the timed window
    spark.read.parquet(os.path.join(log, "batch_00000")).limit(1000).count()

    epoch_secs: list[float] = []
    max_depth = 0
    minors = 0
    t_all = time.monotonic()
    for path in list_batches(log):
        t0 = time.monotonic()
        apply_epoch(table, spark.read.parquet(path), os.path.basename(path))
        depth = len(table.manifest().get("global_deltas", []))
        max_depth = max(max_depth, depth)
        if table.maybe_compact(max_deltas=MAX_DELTAS) is not None:
            minors += 1
            # retention runs with maintenance: keep the manifest count AND
            # the on-disk commit set bounded (without this, superseded
            # delta dirs accumulate — a first 2x10^8 run grew the table
            # dir to 17 GB; with expiry it stays ~ final-table-sized)
            table.expire_snapshots(keep_last=MAX_DELTAS)
        epoch_secs.append(round(time.monotonic() - t0, 2))
    assert max_depth <= MAX_DELTAS, (max_depth, MAX_DELTAS)
    # the throughput denominator stops HERE: the sustained metric is
    # "replay with in-loop maintenance"; the one-time final full compact,
    # the verification count, and the du walk are reported separately
    # (folding them in made the headline depend on run length)
    wall = time.monotonic() - t_all
    tbl_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(tbl)
        for f in fs
    )
    t_maint = time.monotonic()
    table.compact()
    final_rows = table.state().count()
    half = len(epoch_secs) // 2
    first, second = sum(epoch_secs[:half]), sum(epoch_secs[half:])
    # n_batches=1 has no first half; None beats a ZeroDivisionError that
    # would discard the whole completed run's results
    ratio = round(second / first, 3) if half and first else None
    out = {
        "events": n_events,
        "epochs": n_batches,
        "wall_sec": round(wall, 1),
        "events_per_sec": round(n_events / wall, 1),
        "steady_epoch_secs": epoch_secs,
        "second_half_over_first_half": ratio,
        "max_delta_depth": max_depth,
        "minor_compactions": minors,
        "final_compact_sec": round(time.monotonic() - t_maint, 1),
        "final_rows": final_rows,
        "table_gb_before_final_compact": round(tbl_bytes / 2**30, 2),
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Sustained-load run {stamp} — {n_events:,} events, "
            f"{n_batches} epochs, maybe_compact(max_deltas={MAX_DELTAS}) "
            f"in the loop\n\n"
            f"| events/sec | 2nd/1st half epoch time | max delta depth | "
            f"minor compactions | table GB pre-final-compact | final rows |"
            f"\n|---|---|---|---|---|---|\n"
            f"| {out['events_per_sec']:,.0f} | "
            f"{out['second_half_over_first_half']} | {max_depth} | "
            f"{minors} | {out['table_gb_before_final_compact']} | "
            f"{final_rows:,} |\n"
        )
    shutil.rmtree(tbl, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""A/B: replay throughput with vs without maintained views in lockstep.

Measures what `maintain=[MaterializedAggregate, CdfExporter]` costs per
epoch when it rides the batch replay loop — the claim under test is that
each refresh is O(epoch) (one narrowed changes() read + one small write),
so the overhead is a bounded fraction of epoch cost, NOT O(table).

Usage: python scripts/bench_maintain.py [n_events] [repeats]
Appends nothing; prints one JSON line per run + a summary table to stdout
for manual transcription into BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_serverless_elt_pipeline_enterprise_spark.benchkit import work_root  # noqa: E402
from aws_serverless_elt_pipeline_enterprise_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from aws_serverless_elt_pipeline_enterprise_spark.operators.cdf_export import (
        CdfExporter,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.operators.incremental_agg import (
        MaterializedAggregate,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (
        run_replay,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import (
        SnapshotTable,
    )

    root = os.path.join(work_root(), f"maintain_ab_{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    extra = {}
    if root.startswith("/dev/shm"):
        local = os.path.join(root, "local")
        os.makedirs(local, exist_ok=True)
        extra["spark.local.dir"] = local
    spark = get_spark(
        app_name="maintain-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    log = os.path.join(root, "log")
    spec = ChangelogSpec(
        n_events=n_events, n_keys=max(1000, n_events // 12), n_batches=16
    )
    generate_changelog(spark, log, spec)

    MODES = {"without": None, "k1": 1, "k4": 4, "end_only": 10**9}

    def one(mode: str, i: int) -> tuple[float, int]:
        tdir = os.path.join(root, f"t_{mode}_{i}")
        table = SnapshotTable(spark, tdir, key_col="doc_id", n_buckets=64, mode="mor")
        views = None
        if MODES[mode] is not None:
            views = [
                MaterializedAggregate(
                    spark, table, os.path.join(tdir, "_mv"), ["source"]
                ),
                # images='both' (the Delta-CDF two-row encoding a
                # downstream merge consumer wants) ALSO puts the exporter
                # in the aggregate's shared-diff group: one
                # read_changes_since per lockstep tick for both views
                CdfExporter(
                    spark, table, os.path.join(tdir, "_outbox"), images="both"
                ),
            ]
        t0 = time.monotonic()
        run_replay(
            spark, log, table, maintain=views,
            maintain_every=MODES[mode] or 1, compact_every=8,
        )
        dt = time.monotonic() - t0
        # cross-mode invariant: the maintained aggregate must equal a
        # recompute no matter the refresh cadence
        rows = -1
        if views is not None:
            got = {r[0]: r[1] for r in views[0].result().select("source", "cnt").collect()}
            from pyspark.sql import functions as F
            want = {
                r[0]: r[1]
                for r in table.state().groupBy("source").count().collect()
            }
            assert got == want, f"{mode}: maintained agg != recompute"
            rows = sum(got.values())
        shutil.rmtree(tdir, ignore_errors=True)
        return dt, rows

    runs: dict[str, list[float]] = {m: [] for m in MODES}
    one("without", -1)  # discarded warmup
    for i in range(repeats):  # interleaved
        for mode in MODES:
            dt, rows = one(mode, i)
            runs[mode].append(dt)
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "run": i,
                        "wall_sec": round(dt, 2),
                        "events_per_sec": round(n_events / dt, 1),
                    }
                ),
                flush=True,
            )
    med = {m: sorted(v)[len(v) // 2] for m, v in runs.items()}
    base = med["without"]
    print(
        json.dumps(
            {
                "events": n_events,
                "epochs": 16,
                "median_sec": {m: round(v, 2) for m, v in med.items()},
                "overhead_pct": {
                    m: round(100.0 * (v - base) / base, 1)
                    for m, v in med.items()
                    if m != "without"
                },
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

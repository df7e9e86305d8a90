"""O(epoch) vs O(table): incremental view refresh cost as the table grows.

The incremental-maintenance claim is that a MaterializedAggregate refresh
costs O(changes since bookmark), not O(table). This script grows the base
table (one bulk epoch of N keys), then applies ONE fixed-size small epoch
(touching `epoch_keys` keys) and times (a) the incremental span refresh
and (b) a full rebuild of the same aggregate. If the claim holds, (a)
stays ~flat across table sizes while (b) grows with the table.

Usage: python scripts/bench_incremental_vs_rebuild.py [sizes_csv] [epoch_keys]
Default sizes 250k,1m,4m keys; epoch 1000 keys (inside the IN-list
narrowing tier, the 10^10-scale shape for a small CDC epoch).
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
    sizes = [
        int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "250000,1000000,4000000").split(",")
    ]
    epoch_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from aws_serverless_elt_pipeline_enterprise_spark.operators.incremental_agg import (
        MaterializedAggregate,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import (
        SnapshotTable,
    )

    root = os.path.join(work_root(), f"inc_vs_rebuild_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    extra = {}
    if root.startswith("/dev/shm"):
        os.makedirs(os.path.join(root, "local"), exist_ok=True)
        extra["spark.local.dir"] = os.path.join(root, "local")
    spark = get_spark(
        app_name="inc-vs-rebuild",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )

    def synth(n_keys: int, seq0: int, only_first: int | None = None):
        n = only_first or n_keys
        return (
            spark.range(n)
            .select(
                F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
                (F.col("id") + seq0).alias("seq"),
                F.lit("update").alias("op"),
                F.concat(F.lit("src-"), F.pmod(F.col("id"), F.lit(20))).alias("source"),
                (F.pmod(F.col("id") * 7 + seq0, F.lit(400)) + 1).cast("int").alias("n_tok"),
            )
        )

    for n_keys in sizes:
        tdir = os.path.join(root, f"t_{n_keys}")
        t = SnapshotTable(spark, tdir, key_col="doc_id", n_buckets=64, mode="mor")
        t.merge_reduced(synth(n_keys, 0), "bulk")
        t.compact()  # the steady-state table: compacted base
        ma = MaterializedAggregate(
            spark, t, os.path.join(tdir, "_mv"), ["source"], sums={"tok": "n_tok"}
        )
        ma.refresh()  # bootstrap (rebuild) — not the measured path
        # ONE small epoch touching epoch_keys existing keys
        t.merge_reduced(synth(n_keys, 10_000_000, only_first=epoch_keys), "small-1")
        t0 = time.monotonic()
        r = ma.refresh()
        inc_s = time.monotonic() - t0
        assert not r.get("bootstrapped") and not r.get("noop")
        # rebuild comparator: fresh aggregate over the same table
        mb = MaterializedAggregate(
            spark, t, os.path.join(tdir, "_mv2"), ["source"], sums={"tok": "n_tok"}
        )
        t0 = time.monotonic()
        mb.refresh()  # bookmark None -> full rebuild
        reb_s = time.monotonic() - t0
        got = {x["source"]: (x["cnt"], x["tok"]) for x in ma.result().collect()}
        want = {x["source"]: (x["cnt"], x["tok"]) for x in mb.result().collect()}
        assert got == want, f"incremental != rebuild at {n_keys}"
        print(
            json.dumps(
                {
                    "table_keys": n_keys,
                    "epoch_keys": epoch_keys,
                    "incremental_refresh_sec": round(inc_s, 2),
                    "full_rebuild_sec": round(reb_s, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(tdir, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

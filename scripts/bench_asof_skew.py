"""As-of join hot-key skew bench: 90% of rows on ONE key.

Times the single-window path (hot_threshold=None — the hot key is one
task's sort) against the time-slice mitigation (default threshold, the
hot key runs as n_slices tasks + a tiny stitch) on the same synthetic
input, and checks the row counts agree.

Usage: python scripts/bench_asof_skew.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_serverless_elt_pipeline_enterprise_spark.benchkit import (  # noqa: E402
    work_root,
)
from aws_serverless_elt_pipeline_enterprise_spark.operators.asof import (  # noqa: E402
    asof_join,
)
from aws_serverless_elt_pipeline_enterprise_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark(app_name="asof-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # 90% of rows on key 0, the rest spread over 10k keys; half probes,
    # half versions; timestamps dense enough that every probe matches
    base = spark.range(n).select(
        F.when(F.rand(11) < 0.9, F.lit(0))
        .otherwise((F.rand(13) * 10_000).cast("long"))
        .alias("k"),
        (F.rand(17) * 1_000_000).cast("long").alias("t"),
        (F.col("id") % 2 == 0).alias("is_probe"),
        F.col("id").alias("val"),
    )
    fixture = os.path.join(work_root(), "asof_skew")
    base.write.mode("overwrite").parquet(fixture)
    base = spark.read.parquet(fixture)
    probes = base.filter("is_probe").select("k", "t")
    versions = base.filter("NOT is_probe").select("k", "t", "val")

    def run(tag: str, **kw) -> float:
        t0 = time.time()
        # sum over the carried value, NOT count(): count lets Catalyst
        # prune the unused window projection and time only the scan
        row = (
            asof_join(probes, versions, "k", "t", ["val"], **kw)
            .agg(
                F.count(F.lit(1)).alias("n"), F.sum("asof_val").alias("s")
            )
            .first()
        )
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s  rows={row['n']} sum={row['s']}")
        return dt

    run("warmup (single-window)", hot_threshold=None)
    a = run("single-window", hot_threshold=None)
    b = run("time-sliced (auto probe)", hot_threshold=1_000_000)
    c = run("time-sliced (explicit hot_keys)", hot_threshold=1_000_000, hot_keys=[0])
    print(f"speedup auto={a / b:.2f}x explicit={a / c:.2f}x")


if __name__ == "__main__":
    main()

"""Per-query isolation bench (guide §1.4): times declared queries with the
noop sink on the same session settings bench.py uses, and optionally dumps
.explain("formatted") for each to plans/r06/.

bench.py is FROZEN for measurement; this harness exists so optimization
work can isolate and A/B individual queries (different repeat counts,
plan capture, subsets) without touching the measured artifact.

Usage:
  python bench_extra.py [--sf-dir DIR] [--repeats N] [--plans TAG] q1 q2 ...
  python bench_extra.py --all          # every BENCH_QUERIES entry
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from aws_serverless_elt_pipeline_enterprise_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    )
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--plans",
        default=None,
        help="suffix tag: write plans/r06/<query>_<TAG>.txt for each query",
    )
    ap.add_argument(
        "--plans-only",
        action="store_true",
        help="capture plans without timed noop runs",
    )
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="cdc-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
    )
    qs = entry_mod.queries()
    names = list(qs) if args.all else args.queries
    sf_dir = args.sf_dir

    def run_once(fn) -> float:
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        return dt

    # discarded warmup (same as bench.py)
    if not args.plans_only:
        run_once(qs["cdc_final_state"])
    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"## unknown query: {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
            print(f"plan written: {name}", file=sys.stderr, flush=True)
        if args.plans_only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = sorted(run_once(qs[name]) for _ in range(args.repeats))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(times[len(times) // 2], 3),
            "samples": [round(t, 3) for t in times],
        }
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "repeats": args.repeats, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()

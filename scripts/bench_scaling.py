"""Two-cluster-size scaling evidence (BASELINE.json north rule).

Runs the identical CDC replay job on the same input at local[N] and
local[4N] (subprocesses, fresh JVMs) and reports events/sec at both plus
efficiency = (rate_4N / rate_N) / 4. The sandbox has no multi-node
cluster; parallelism level stands in for executor count (SURVEY.md §6).

MEDIAN-OF-3 PER LEVEL by default: single-shot wall times at every
parallelism level swing +/-25% on this box (a ~1-in-3 slow excursion),
which moves a single-pairing efficiency ratio by +/-0.2 — the r2/r3
numbers ranged 0.54-0.93 on identical code. Runs are interleaved
(N, 4N, N, 4N, ...) so slow ambient phases hit both levels evenly.

Usage: python scripts/bench_scaling.py [n_events] [N] [repeats]
Appends a markdown row set to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_events: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_EVENTS=str(n_events),
        SPARK_GRAFT_SKIP_QUERIES="1",
        SPARK_GRAFT_TMPFS="1",  # single local disk can't scale with threads
        SPARK_DRIVER_MEMORY="24g",  # lazy huge heaps cause kernel reclaim noise
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0 or not out.stdout.strip():
        # surface the child's actual diagnostic (OOM, crash) instead of
        # an IndexError on empty stdout that discards it
        raise RuntimeError(
            f"bench.py at local[{cpus}] failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-2000:]}"
        )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo_rates, hi_rates = [], []
    for i in range(repeats):
        lo_rates.append(run_at(n, n_events)["replay"]["events_per_sec"])
        hi_rates.append(run_at(4 * n, n_events)["replay"]["events_per_sec"])
        print(
            f"round {i + 1}/{repeats}: local[{n}]={lo_rates[-1]:,.0f} "
            f"local[{4 * n}]={hi_rates[-1]:,.0f} ev/s",
            flush=True,
        )
    from statistics import median as med  # proper even-count median
    r_lo, r_hi = med(lo_rates), med(hi_rates)
    eff = (r_hi / r_lo) / 4
    fmt = lambda xs: ", ".join(f"{x:,.0f}" for x in xs)  # noqa: E731
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    block = f"""
## Scaling run {stamp} — {n_events:,} events, 8 epochs, same input, median of {repeats}/level (interleaved fresh JVMs)

| parallelism | events/sec per run | median events/sec |
|---|---|---|
| local[{n}] (N) | {fmt(lo_rates)} | {r_lo:,.0f} |
| local[{4 * n}] (4N) | {fmt(hi_rates)} | {r_hi:,.0f} |

**Scaling efficiency (median rate_4N / median rate_N) / 4 = {eff:.3f}** (target >= 0.8)
"""
    print(block)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(block)


if __name__ == "__main__":
    main()

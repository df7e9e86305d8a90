"""A/B: string shingles vs 64-bit hashed shingles through the inverted-
index shuffle of ngram_jaccard_pairs. Prints one JSON line with
per-mode medians (interleaved repeats, discarded warmup)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_serverless_elt_pipeline_enterprise_spark.functions import dedupe as D  # noqa: E402
from aws_serverless_elt_pipeline_enterprise_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_QUERY_REPEATS", "3"))


def _run(docs, mode: str | None) -> float:
    t0 = time.monotonic()
    D.ngram_jaccard_pairs(
        docs, threshold=0.5, df_cap=100, hash_shingles=mode
    ).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark(
        app_name="hash-shingles-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 4,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    _run(docs, None)  # discarded warmup (JIT + shuffle machinery)
    runs: dict[str, list[float]] = {"string": [], "xxhash64": [], "portable": []}
    for _ in range(REPEATS):  # interleaved so ambient drift hits all modes
        runs["string"].append(_run(docs, None))
        runs["xxhash64"].append(_run(docs, "xxhash64"))
        runs["portable"].append(_run(docs, "portable"))
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "runs": {k: [round(x, 3) for x in sorted(v)] for k, v in runs.items()},
                "medians": {
                    k: round(statistics.median(v), 3) for k, v in runs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()

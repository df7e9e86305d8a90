"""A/B: the five dedup-family outputs standalone vs dedup_pipeline
(shared tokenization). Prints one JSON line with per-mode medians."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_serverless_elt_pipeline_enterprise_spark.functions import dedupe as D  # noqa: E402
from aws_serverless_elt_pipeline_enterprise_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_QUERY_REPEATS", "3"))


def _eval(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def standalone(spark, docs) -> float:
    t0 = time.monotonic()
    _eval(D.exact_dup_groups(docs))
    _eval(D.ngram_jaccard_pairs(docs, threshold=0.5, df_cap=100))
    _eval(D.minhash_lsh_pairs(docs, k=32, bands=8, hash_mode="portable"))
    _eval(D.simhash_near_dup_pairs(docs, hash_mode="portable"))
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5, df_cap=100)
    _eval(D.dup_clusters(pairs))
    dt = time.monotonic() - t0
    spark.catalog.clearCache()
    return dt


def pipelined(spark, docs) -> float:
    t0 = time.monotonic()
    out = D.dedup_pipeline(
        docs, threshold=0.5, df_cap=100, k=32, bands=8, hash_mode="portable"
    )
    for name in ("exact", "ngram_pairs", "minhash_pairs", "simhash_pairs", "clusters"):
        _eval(out[name])
    dt = time.monotonic() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    spark = get_spark(
        app_name="dedup-pipeline-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 4,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    standalone(spark, docs)  # discarded warmup (JIT + shuffle machinery)
    a, b = [], []
    for _ in range(REPEATS):  # interleaved so ambient drift hits both
        a.append(standalone(spark, docs))
        b.append(pipelined(spark, docs))
    a.sort()
    b.sort()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "standalone_runs": [round(x, 3) for x in a],
                "pipeline_runs": [round(x, 3) for x in b],
                "standalone_median": round(a[len(a) // 2], 3),
                "pipeline_median": round(b[len(b) // 2], 3),
                "speedup": round(a[len(a) // 2] / b[len(b) // 2], 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

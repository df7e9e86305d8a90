"""Milestone 1-2: generator determinism + the minimum end-to-end slice.

Oracle: the order-independent reduction in DuckDB/pandas — for each doc_id
the payload of the max-seq event, absent if that event is a delete
(SURVEY.md §5.2 item 2). Per-row invariant: token-array equality.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.operators.dedup import dedup_events
from aws_serverless_elt_pipeline_enterprise_spark.operators.lww import lww_reduce
from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
    ChangelogSpec,
    changelog_df,
    generate_changelog,
    list_batches,
)

SPEC = ChangelogSpec(n_events=20_000, n_keys=1_500, n_batches=8, seed=42)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("changelog"))
    generate_changelog(spark, d, SPEC)
    return d


def oracle_final_state(parquet_glob: str) -> list[tuple]:
    """DuckDB order-independent reduction: per key, payload of max-seq
    non-delete event; ties impossible post-dedup (duplicates identical)."""
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH dedup AS (
          SELECT DISTINCT ON (doc_id, seq) *
          FROM read_parquet('{parquet_glob}')
          ORDER BY doc_id, seq
        ),
        latest AS (
          SELECT doc_id,
                 arg_max(op, seq)     AS op,
                 arg_max(tokens, seq) AS tokens,
                 arg_max(n_tok, seq)  AS n_tok,
                 arg_max(source, seq) AS source,
                 max(seq)             AS seq
          FROM dedup GROUP BY doc_id
        )
        SELECT doc_id, tokens, n_tok, source
        FROM latest WHERE op != 'delete'
        ORDER BY doc_id
        """
    ).fetchall()
    con.close()
    return rows


def test_generator_is_deterministic(spark):
    a = changelog_df(spark, SPEC).orderBy("seq", "doc_id").limit(100).collect()
    b = changelog_df(spark, SPEC).orderBy("seq", "doc_id").limit(100).collect()
    assert a == b


def test_generator_injects_anomalies(spark, log_dir):
    df = spark.read.parquet(f"{log_dir}/batch_*")
    n = df.count()
    n_dedup = df.dropDuplicates(["doc_id", "seq"]).count()
    assert n_dedup < n, "duplicate envelopes must exist"
    assert df.filter(F.col("op") == "delete").count() > 0
    # out-of-order: some event appears in a later batch than a higher-seq one
    mixed = (
        df.groupBy("batch_id")
        .agg(F.min("seq").alias("lo"), F.max("seq").alias("hi"))
        .orderBy("batch_id")
        .collect()
    )
    overlaps = sum(
        1
        for i in range(len(mixed) - 1)
        if mixed[i]["hi"] > mixed[i + 1]["lo"]
    )
    assert overlaps > 0, "batches must overlap in seq (out-of-order arrivals)"
    # hot keys
    top = (
        df.groupBy("doc_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    assert top["count"] > 3 * n / SPEC.n_keys, "hot keys must be skewed"


def test_minimum_slice_matches_oracle(spark, log_dir):
    events = spark.read.parquet(f"{log_dir}/batch_*")
    final = (
        lww_reduce(dedup_events(events))
        .filter(F.col("op") != "delete")
        .select("doc_id", "tokens", "n_tok", "source")
        .orderBy("doc_id")
    )
    got = [(r.doc_id, r.tokens, r.n_tok, r.source) for r in final.collect()]
    want = oracle_final_state(f"{log_dir}/batch_*/*.parquet")
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == w[1], f"token-array mismatch for {g[0]}"  # the invariant
        assert (g[2], g[3]) == (w[2], w[3])


def test_salted_lww_equals_unsalted(spark, log_dir):
    events = dedup_events(spark.read.parquet(f"{log_dir}/batch_*"))
    a = lww_reduce(events, salted=False).orderBy("doc_id").collect()
    b = lww_reduce(events, salted=True, n_salts=8).orderBy("doc_id").collect()
    assert a == b


def test_batches_cover_all_events(spark, log_dir):
    batches = list_batches(log_dir)
    assert len(batches) == SPEC.n_batches
    total = spark.read.parquet(f"{log_dir}/batch_*").count()
    assert total == SPEC.n_events

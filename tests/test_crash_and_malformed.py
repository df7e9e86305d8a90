"""Crash-window tolerance + generator-injected malformed envelopes."""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.quality.verify import states_equal
from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
)
from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import run_replay
from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import SnapshotTable


def test_malformed_envelopes_quarantined_end_to_end(spark, tmp_path):
    spec = ChangelogSpec(
        n_events=8_000, n_keys=600, n_batches=4, seed=41, malformed_rate=0.03
    )
    log = str(tmp_path / "log")
    generate_changelog(spark, log, spec)
    raw = spark.read.parquet(f"{log}/batch_*")
    n_bad = raw.filter(F.col("op") == "frobnicate").count()
    assert n_bad > 0, "generator must inject malformed envelopes"

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8, mode="mor")
    qdir = str(tmp_path / "q")
    run_replay(spark, log, table, quarantine_dir=qdir)
    q = spark.read.parquet(f"{qdir}/epoch=*")
    assert q.count() == n_bad
    assert {r._reject_reason for r in q.collect()} == {"unknown_op"}

    # oracle over VALID events only
    con = duckdb.connect()
    want = con.sql(
        f"""
        WITH valid AS (
          SELECT * FROM read_parquet('{log}/batch_*/*.parquet')
          WHERE op IN ('insert','update','delete')
        ), dedup AS (
          SELECT DISTINCT ON (doc_id, seq) * FROM valid ORDER BY doc_id, seq
        ), latest AS (
          SELECT doc_id, arg_max(op, seq) op, arg_max(tokens, seq) tokens
          FROM dedup GROUP BY doc_id
        )
        SELECT doc_id, tokens FROM latest WHERE op != 'delete' ORDER BY doc_id
        """
    ).fetchall()
    con.close()
    got = [
        (r.doc_id, r.tokens)
        for r in table.state().select("doc_id", "tokens").orderBy("doc_id").collect()
    ]
    assert got == [(k, t) for k, t in want]


def test_crashed_commit_orphans_are_harmless_and_vacuumable(spark, tmp_path):
    """Simulate a crash between data write and manifest commit: an orphan
    commit dir exists but no manifest references it. Readers are unaffected
    (manifest is the source of truth), subsequent merges proceed, and
    expire_orphans removes the garbage."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    table.merge_reduced(
        spark.createDataFrame([("insert", "a", 1, [1])], schema), "e1"
    )
    state_before = table.state()

    # fake a crashed commit: data written, manifest never happened
    orphan = os.path.join(str(tmp_path / "t"), "commits", "c_999999_crashed")
    spark.createDataFrame([("insert", "zz", 9, [9])], schema).write.parquet(orphan)
    assert states_equal(table.state(), state_before), "readers unaffected"
    assert "zz" not in {r.doc_id for r in table.state().collect()}

    # engine continues normally
    table.merge_reduced(
        spark.createDataFrame([("insert", "b", 2, [2])], schema), "e2"
    )
    assert {r.doc_id for r in table.state().collect()} == {"a", "b"}

    removed = table.expire_orphans()
    assert any("crashed" in r for r in removed)
    assert {r.doc_id for r in table.state().collect()} == {"a", "b"}

"""Streaming windowed aggregation with watermarks (§2.9): the dt-partition
rollup of the reference as a real event-time window over the change log."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
)


def _stream(spark, log_dir):
    schema = spark.read.parquet(f"{log_dir}/batch_00000").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(f"{log_dir}/batch_*")
    )


def test_windowed_count_complete_mode_matches_batch(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_changelog(
        spark, log, ChangelogSpec(n_events=6_000, n_keys=500, n_batches=4, seed=21)
    )
    agg = (
        _stream(spark, log)
        .withWatermark("event_time", "1 hour")
        .groupBy(F.window("event_time", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.w.start, r.w.end): r.cnt
        for r in spark.sql("select * from winagg").collect()
    }
    want = {
        (r.w.start, r.w.end): r.cnt
        for r in spark.read.parquet(f"{log}/batch_*")
        .groupBy(F.window("event_time", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_windowed_count_append_mode_emits_closed_windows(spark, tmp_path):
    """Append mode emits only windows sealed by the watermark — each
    emitted window must carry its final (batch-equal) count, and open
    windows at end-of-stream are withheld."""
    log = str(tmp_path / "log")
    generate_changelog(
        spark, log, ChangelogSpec(n_events=6_000, n_keys=500, n_batches=4, seed=22)
    )
    agg = (
        _stream(spark, log)
        .withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winappend")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.w.start, r.w.end): r.cnt
        for r in spark.sql("select * from winappend").collect()
    }
    want = {
        (r.w.start, r.w.end): r.cnt
        for r in spark.read.parquet(f"{log}/batch_*")
        .groupBy(F.window("event_time", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got, "append mode must emit sealed windows"
    assert set(got) < set(want), "open tail windows are withheld"
    for k, v in got.items():
        assert v == want[k], f"sealed window {k} must carry its final count"


def test_stateful_lww_stream_matches_batch_oracle(spark, tmp_path):
    """applyInPandasWithState per-key LWW: the last emitted update per key
    must equal the batch max-seq reduction over valid events."""
    from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    from aws_serverless_elt_pipeline_enterprise_spark.streaming.stateful import (
        lww_latest_stream,
    )

    spec = ChangelogSpec(n_events=6_000, n_keys=400, n_batches=4, seed=21)
    log = str(tmp_path / "log")
    generate_changelog(spark, log, spec)
    schema = spark.read.parquet(f"{log}/batch_00000").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(f"{log}/batch_*")
    )
    emitted = []

    def sink(df, _bid):
        emitted.extend(df.collect())

    q = (
        lww_latest_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per key (updates are emitted in seq-advancing order)
    got = {}
    for r in emitted:
        if r.doc_id not in got or r.seq > got[r.doc_id][0]:
            got[r.doc_id] = (r.seq, r.op)
    from pyspark.sql import functions as F

    want = {
        r.doc_id: (r.seq, r.op)
        for r in spark.read.parquet(f"{log}/batch_*")
        .groupBy("doc_id")
        .agg(F.max("seq").alias("seq"), F.max_by("op", "seq").alias("op"))
        .collect()
    }
    assert got == want


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Built-in session_window (gap-merged windows) in STREAMING mode with
    a watermark converges to the batch session_window aggregation over the
    same log — the W-family's session counterpart to the tumbling test."""
    from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    from pyspark.sql import functions as F

    spec = ChangelogSpec(n_events=5_000, n_keys=200, n_batches=4, seed=31)
    log = str(tmp_path / "log")
    generate_changelog(spark, log, spec)
    schema = spark.read.parquet(f"{log}/batch_00000").schema

    def agg(df):
        return df.groupBy(
            F.session_window("event_time", "30 minutes").alias("w"), "doc_id"
        ).agg(F.count(F.lit(1)).alias("cnt"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(f"{log}/batch_*")
        .withWatermark("event_time", "1 hour")
    )
    rows = []
    q = (
        agg(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(lambda df, _b: (rows.clear(), rows.extend(df.collect())))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.w.start, r.w.end): r.cnt for r in rows
    }
    want = {
        (r.doc_id, r.w.start, r.w.end): r.cnt
        for r in agg(spark.read.parquet(f"{log}/batch_*")).collect()
    }
    assert got == want and len(want) > 0

"""Deterministic synthetic CDC change-event log.

The engine's input: an ordered log of insert/update/delete envelopes keyed
by ``doc_id`` with a per-key-monotone sequence number and a pre-tokenized
payload ``(tokens:array<int>, n_tok:int, source:string)``.

This generalizes the reference's synthetic generator
(``scripts/gen_fake_events.py:25-61`` in the reference repo) but is fully
deterministic: every field is a pure function of the global event index —
no wall clock, no RNG state (the reference's ``datetime.now`` fallbacks at
``lambdas/shared/schemas.py:96`` are deliberately not reproduced). All
columns are built from JVM-side expressions over ``spark.range`` — no
Python row loop — so generation itself scales to 10^10 rows on a cluster.

Injected anomalies (see FIXTURES.md §1):
  * exact-duplicate (doc_id, seq) envelopes  -> dedup (D1)
  * out-of-order arrivals across micro-batches -> LWW (D3)
  * Zipf-ish hot keys                         -> salting (R3)
  * deletes with null payload                 -> MERGE delete semantics
  * corrupt n_tok on a small fraction         -> DQ gate
  * optional additive column + int widening   -> schema evolution
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 50_257  # GPT-2-ish vocab, arbitrary but fixed
MAX_TOKENS = 64
SOURCES = ("web", "books", "code")

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# Schema after the mid-log additive evolution: nullable quality_score added,
# n_tok widened int32 -> int64.
CHANGE_EVENT_SCHEMA_EVOLVED = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("quality_score", T.DoubleType(), True),
    ]
)


@dataclass(frozen=True)
class ChangelogSpec:
    n_events: int = 100_000
    n_keys: int = 10_000
    n_batches: int = 16
    seed: int = 42
    # fraction of events that are exact duplicates of an earlier envelope
    dup_rate: float = 0.05
    # fraction of events whose arrival batch is shifted later (out-of-order)
    late_rate: float = 0.10
    # fraction of delete ops
    delete_rate: float = 0.05
    # fraction of rows whose n_tok is deliberately inconsistent with tokens
    corrupt_ntok_rate: float = 0.002
    # hot keys: this fraction of events hit only `n_hot` keys
    hot_rate: float = 0.20
    n_hot: int = 4
    # batch index (0-based) at which quality_score appears and n_tok widens;
    # None disables schema evolution
    evolve_at_batch: int | None = None
    # fraction of malformed envelopes (unknown op / null payload on a
    # non-delete) -> must land in quarantine (FIXTURES.md §1)
    malformed_rate: float = 0.0


def _mix(*cols) -> F.Column:
    """Deterministic 64-bit mix of columns (xxhash64 is seed-stable)."""
    return F.xxhash64(*cols)


def changelog_df(spark: SparkSession, spec: ChangelogSpec) -> DataFrame:
    """The full event log as one DataFrame (before slicing into batches).

    ``seq`` is the global event index: any subsequence is monotone per key,
    so per-key LWW == per-key max(seq). Duplicate events copy an earlier
    index's (doc_id, seq, payload) exactly.
    """
    s = F.lit(spec.seed)
    df = spark.range(spec.n_events).withColumnRenamed("id", "i")

    # duplicates: event i with h_dup < dup_rate replays event i - delta
    h_dup = F.abs(_mix(F.col("i"), s, F.lit("dup"))) % 1_000_000
    delta = F.abs(_mix(F.col("i"), s, F.lit("delta"))) % 1000 + 1
    eff = F.when(
        (h_dup < int(spec.dup_rate * 1_000_000)) & (F.col("i") > 1000),
        F.col("i") - delta,
    ).otherwise(F.col("i"))
    df = df.withColumn("seq", eff.cast("long"))

    # key choice: hot fraction lands on n_hot keys, rest uniform over n_keys
    h_hot = F.abs(_mix(F.col("seq"), s, F.lit("hot"))) % 1_000_000
    key_idx = F.when(
        h_hot < int(spec.hot_rate * 1_000_000),
        F.abs(_mix(F.col("seq"), s, F.lit("hotk"))) % spec.n_hot,
    ).otherwise(F.abs(_mix(F.col("seq"), s, F.lit("key"))) % spec.n_keys)
    df = df.withColumn("doc_id", F.concat(F.lit("doc_"), F.lpad(key_idx.cast("string"), 8, "0")))

    # op
    h_op = F.abs(_mix(F.col("seq"), s, F.lit("op"))) % 1_000_000
    is_del = h_op < int(spec.delete_rate * 1_000_000)
    # first-ever events for a key tend to be inserts; insert-vs-update is
    # semantically identical under LWW merge, so split them by hash
    op = (
        F.when(is_del, F.lit("delete"))
        .when(h_op % 2 == 0, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    if spec.malformed_rate > 0:
        h_bad = F.abs(_mix(F.col("i"), s, F.lit("bad"))) % 1_000_000
        op = F.when(
            h_bad < int(spec.malformed_rate * 1_000_000), F.lit("frobnicate")
        ).otherwise(op)
        is_del = is_del & (h_bad >= int(spec.malformed_rate * 1_000_000))
    df = df.withColumn("op", op)

    # event_time: derived from seq (1s per event from a fixed epoch)
    df = df.withColumn(
        "event_time",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq")),
    )

    # arrival batch: normally seq-ordered; a late_rate fraction shifted +1..3
    per_batch = max(1, spec.n_events // spec.n_batches)
    base_batch = (F.col("seq") / per_batch).cast("int")
    # keyed on the raw index i (not seq) so an exact-duplicate envelope can
    # arrive in a *different* batch than its original — cross-epoch dedup
    h_late = F.abs(_mix(F.col("i"), s, F.lit("late"))) % 1_000_000
    shift = F.abs(_mix(F.col("i"), s, F.lit("shift"))) % 3 + 1
    batch = F.when(h_late < int(spec.late_rate * 1_000_000), base_batch + shift).otherwise(
        base_batch
    )
    df = df.withColumn(
        "batch_id", F.least(batch, F.lit(spec.n_batches - 1)).cast("int")
    )

    # payload: tokens = deterministic array, null for deletes
    tok_len = (F.abs(_mix(F.col("doc_id"), F.col("seq"), s)) % MAX_TOKENS + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), tok_len - 1),
        lambda j: (F.abs(_mix(F.col("doc_id"), F.col("seq"), j, s)) % VOCAB_SIZE).cast("int"),
    )
    df = df.withColumn("tokens", F.when(~is_del, tokens))

    h_corrupt = F.abs(_mix(F.col("seq"), s, F.lit("corrupt"))) % 1_000_000
    n_tok = F.when(
        h_corrupt < int(spec.corrupt_ntok_rate * 1_000_000),
        F.size("tokens") + 1,
    ).otherwise(F.size("tokens"))
    df = df.withColumn("n_tok", F.when(~is_del, n_tok.cast("int")))

    src_idx = F.abs(_mix(F.col("doc_id"), s, F.lit("src"))) % len(SOURCES)
    src = F.element_at(F.array(*[F.lit(x) for x in SOURCES]), (src_idx + 1).cast("int"))
    df = df.withColumn("source", F.when(~is_del, src))

    out_cols = ["op", "doc_id", "seq", "event_time", "batch_id", "tokens", "n_tok", "source"]
    if spec.evolve_at_batch is not None:
        # evolution is a property of the EVENT (its seq position in the log),
        # not of arrival time — a duplicated envelope must stay identical
        # regardless of which batch it lands in
        evolved = F.col("seq") >= spec.evolve_at_batch * per_batch
        df = df.withColumn(
            "quality_score",
            F.when(
                evolved & ~is_del,
                (F.abs(_mix(F.col("doc_id"), F.col("seq"), s, F.lit("q"))) % 1000) / 1000.0,
            ),
        ).withColumn("n_tok", F.col("n_tok").cast("long"))
        out_cols.append("quality_score")
    return df.select(*out_cols)


def generate_changelog(spark: SparkSession, out_dir: str, spec: ChangelogSpec) -> list[str]:
    """Write the log as one parquet dir per micro-batch: batch_00000/ ...

    The dir-per-batch layout stands in for an ordered binlog/WAL: each dir
    is one epoch of arrival. Pre-evolution batches are written with the
    narrow schema (n_tok int32, no quality_score) so readers must handle
    the widening mid-stream.
    """
    df = changelog_df(spark, spec).cache()
    paths = []
    for b in range(spec.n_batches):
        batch = df.filter(F.col("batch_id") == b)
        if spec.evolve_at_batch is not None and b < spec.evolve_at_batch:
            batch = batch.drop("quality_score").withColumn(
                "n_tok", F.col("n_tok").cast("int")
            )
        p = os.path.join(out_dir, f"batch_{b:05d}")
        # file count scales with batch size (~150k rows/file): scan
        # parallelism of the replay must not be capped by the log layout
        npart = max(4, min(256, (spec.n_events // spec.n_batches) // 150_000))
        batch.repartition(npart).write.mode("overwrite").parquet(p)
        paths.append(p)
    df.unpersist()
    return paths


def list_batches(log_dir: str) -> list[str]:
    return sorted(
        os.path.join(log_dir, d)
        for d in os.listdir(log_dir)
        if d.startswith("batch_") and os.path.isdir(os.path.join(log_dir, d))
    )


def read_changelog_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)

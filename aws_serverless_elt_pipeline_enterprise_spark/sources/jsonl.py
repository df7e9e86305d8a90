"""Bronze JSONL ingest -> silver parquet: the reference pipeline's own
record types, Spark-first.

Reference semantics re-expressed (file:line cites):
  * JSONL reading, blank lines skipped, JSON-array files accepted
    (lambdas/shared/utils.py:74-94 iter_json_records)        -> spark.read
    .json PERMISSIVE + columnNameOfCorruptRecord; multiLine for arrays
  * record_type dispatch, unknown types rejected
    (lambdas/shared/schemas.py:26-28)                        -> filter +
    quarantine split
  * projection to the declared per-type column list, missing -> NULL,
    extras dropped (schemas.py:30-33)                        -> select
  * ISO-8601 -> UTC 'Z' canonical timestamps (schemas.py:41-47)
  * dt partition column = event_time[:10], fallback date
    (schemas.py:90-96; the datetime.now fallback is replaced by a fixed
    default for determinism)
  * lineage _source struct (lambdas/ingest/app.py:119) -> {file} via
    input_file_name(). FILE-level only, deliberately: the reference's
    line_no comes from its row-at-a-time loop; a distributed JSON scan
    has no stable row-in-file order once a file splits across tasks, and
    faking one (monotonically_increasing_id) would be lineage that lies.
    Quarantined rows carry their full original record, which locates them.
  * silver layout silver/<type>/dt=YYYY-MM-DD, <=5000 rows/file
    (lambdas/transform/app.py:65,92-108)                     ->
    partitionBy(record_type, dt) + maxRecordsPerFile
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# declared schemas, from lambdas/shared/schemas.py:15-22 (+ physical types
# from to_pyarrow_schema, schemas.py:50-87)
RECORD_SCHEMAS: dict[str, T.StructType] = {
    "shipments": T.StructType(
        [
            T.StructField("record_type", T.StringType()),
            T.StructField("event_time", T.StringType()),
            T.StructField("shipment_id", T.StringType()),
            T.StructField("origin", T.StringType()),
            T.StructField("destination", T.StringType()),
            T.StructField("carrier", T.StringType()),
            T.StructField("weight_kg", T.DoubleType()),
        ]
    ),
    "tracking_events": T.StructType(
        [
            T.StructField("record_type", T.StringType()),
            T.StructField("event_time", T.StringType()),
            T.StructField("shipment_id", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("city", T.StringType()),
        ]
    ),
    "invoice_lines": T.StructType(
        [
            T.StructField("record_type", T.StringType()),
            T.StructField("event_time", T.StringType()),
            T.StructField("invoice_id", T.StringType()),
            T.StructField("sku", T.StringType()),
            T.StructField("quantity", T.LongType()),
            T.StructField("unit_price", T.DoubleType()),
            T.StructField("line_total", T.DoubleType()),
        ]
    ),
}

# union of all declared fields (for the single-pass read)
_ALL_FIELDS: list[T.StructField] = []
_seen: set[str] = set()
for _schema in RECORD_SCHEMAS.values():
    for _f in _schema.fields:
        if _f.name not in _seen:
            _ALL_FIELDS.append(_f)
            _seen.add(_f.name)

READ_SCHEMA = T.StructType(_ALL_FIELDS + [T.StructField("_corrupt_record", T.StringType())])

DEFAULT_DT = "1970-01-01"  # deterministic replacement for the reference's
# datetime.now() fallback (schemas.py:96) — wall-clock is banned in data


def read_bronze(
    spark: SparkSession, path: str, multi_line: bool = False
) -> DataFrame:
    """Read bronze JSONL (or JSON-array files with multi_line=True) with a
    declared schema (no inference pass over 100 TB) and corrupt-record
    routing. Blank lines are dropped by the JSON source already."""
    reader = (
        spark.read.schema(READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if multi_line:
        reader = reader.option("multiLine", "true")
    df = reader.json(path)
    return df.withColumn(
        "_source",
        F.struct(F.input_file_name().alias("file")),
    )


def normalize_bronze(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(silver-ready, quarantine): validate record_type, canonicalize the
    timestamp, derive the dt partition. One declarative split — the
    reference does this row-at-a-time in two different Lambdas."""
    known = F.col("record_type").isin(*RECORD_SCHEMAS.keys())
    parsed = F.col("_corrupt_record").isNull()
    good = df.filter(parsed & known)
    bad = df.filter(~(parsed & known) | F.col("record_type").isNull()).withColumn(
        "_reject_reason",
        F.when(~parsed, "corrupt_json").otherwise("unknown_record_type"),
    )

    # try_to_timestamp, NOT to_timestamp: Spark 4's default ANSI mode
    # makes to_timestamp THROW on the first unparseable string, so the
    # fallback chain below (keep raw -> substring dt -> DEFAULT_DT) was
    # dead code and one bad timestamp killed the whole ingest job
    ts = F.try_to_timestamp(F.col("event_time"))
    good = (
        good.withColumn(
            "event_time",
            F.when(
                ts.isNotNull(),
                F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            ).otherwise(F.col("event_time")),
        )
        .withColumn(
            "dt",
            F.coalesce(
                F.date_format(ts, "yyyy-MM-dd"),
                F.substring(F.col("event_time"), 1, 10),
                F.lit(DEFAULT_DT),
            ),
        )
        .drop("_corrupt_record")
    )
    return good, bad


def project_record_type(df: DataFrame, record_type: str) -> DataFrame:
    """Exactly the declared columns for the type, in order (P1)."""
    schema = RECORD_SCHEMAS[record_type]
    return df.filter(F.col("record_type") == record_type).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields],
        F.col("dt"),
    )


def write_silver(
    df: DataFrame, silver_root: str, max_records_per_file: int = 5000
) -> None:
    """Silver layout: <root>/record_type=<t>/dt=<d>/part-*.parquet with the
    reference's 5000-row file bound (MAX_RECORDS_PER_FILE,
    transform/app.py:65). partitionBy gives the same physical layout the
    Glue crawler would register; no crawler needed — Spark reads the
    partitions natively."""
    (
        df.repartition("record_type", "dt")
        .write.mode("append")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("record_type", "dt")
        .parquet(silver_root)
    )


def read_silver(
    spark: SparkSession, silver_root: str, record_type: str | None = None
) -> DataFrame:
    """Silver reader matching the on-disk contract: each record_type
    partition carries EXACTLY its declared columns (per-type schemas,
    like the reference's one-Glue-table-per-type layout). Read one type
    for a clean per-type schema; read the root (record_type=None) for
    cross-type queries — that needs mergeSchema, since a plain root read
    adopts one arbitrary footer's schema and drops the other types'
    columns."""
    if record_type is not None:
        import os

        # one declared schema for BOTH branches: dt is always a string
        # (partition type inference would otherwise turn yyyy-MM-dd dirs
        # into DateType on a non-empty read while the empty-type fallback
        # declares string — the same consumer would see two dtypes and
        # unions across them would fail or silently cast). record_type
        # (the other partition column) is declared too: pre-r4 inference
        # surfaced it, and a consumer selecting it must not regress to
        # AnalysisException just because the schema became explicit.
        schema = T.StructType(
            list(RECORD_SCHEMAS[record_type].fields)
            + [
                T.StructField("record_type", T.StringType()),
                T.StructField("dt", T.StringType()),
            ]
        )
        path = f"{silver_root}/record_type={record_type}"
        if not os.path.isdir(path):
            # a type with no ingested rows has no partition dir; a
            # per-type consumer iterating RECORD_SCHEMAS must get an
            # empty frame with the declared schema, not PATH_NOT_FOUND
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).option("basePath", silver_root).parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(silver_root)


def ingest_bronze_to_silver(
    spark: SparkSession,
    bronze_path: str,
    silver_root: str,
    quarantine_dir: str | None = None,
    multi_line: bool = False,
) -> dict:
    """The whole §3.1 reference path as one lineage. Returns the counter
    dict the reference logs per invoke (ingest/app.py:136-171)."""
    raw = read_bronze(spark, bronze_path, multi_line=multi_line)
    good, bad = normalize_bronze(raw)
    good = good.cache()
    # per-type projection BEFORE the write (reference schemas.py:30-33):
    # each record_type partition carries exactly its declared columns —
    # writing the union schema once would pollute every type's partition
    # with every other type's columns as nulls
    for rt in RECORD_SCHEMAS:
        write_silver(project_record_type(good.drop("_source"), rt), silver_root)
    n_good = good.count()
    bad = bad.cache()  # count + quarantine write must not re-scan bronze twice
    n_bad = bad.count()
    if quarantine_dir is not None and n_bad:
        bad.write.mode("append").json(quarantine_dir)
    bad.unpersist()
    good.unpersist()
    return {"records": n_good, "dropped": n_bad}

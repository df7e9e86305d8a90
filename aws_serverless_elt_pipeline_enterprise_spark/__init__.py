"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the semantics of the reference pipeline
(wyang10/AWS-Serverless-ELT-Pipeline-Enterprise: S3 bronze JSONL -> Lambda
ingest with DynamoDB idempotency -> SQS -> Lambda transform -> S3 silver
Parquet) as one idiomatic Structured Streaming / DataFrame lineage:

    read change log -> normalize -> dedup (doc_id, seq) -> per-key LWW
    -> salted bucketed MERGE into a snapshot table -> epoch-idempotent commit

Everything here derives from the public Apache Spark API only.
"""

__version__ = "0.1.0"

from aws_serverless_elt_pipeline_enterprise_spark.tableio.snapshot import (  # noqa: F401
    CommitConflictError,
    SnapshotTable,
)

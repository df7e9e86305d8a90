from aws_serverless_elt_pipeline_enterprise_spark.sources.changelog import (  # noqa: F401
    CHANGE_EVENT_SCHEMA,
    generate_changelog,
    read_changelog_batch,
    list_batches,
)

from aws_serverless_elt_pipeline_enterprise_spark.plans.checks import (  # noqa: F401
    explain_str,
    pushed_filters,
    read_schema_columns,
    has_operator,
    codegen_span_count,
    exchange_count,
)

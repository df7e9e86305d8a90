from aws_serverless_elt_pipeline_enterprise_spark.quality.gates import (  # noqa: F401
    DQResult,
    run_dq_gate,
)

from aws_serverless_elt_pipeline_enterprise_spark.streaming.replay import (  # noqa: F401
    ReplayResult,
    refresh_views,
    run_replay,
    run_replay_streaming,
)

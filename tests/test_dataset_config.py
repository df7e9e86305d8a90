"""Per-dataset declarative config (reference configs/ups_shipping.yaml)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.sources.dataset_config import (
    DatasetConfig,
)

CFG_YAML = """
dataset: ups_shipping
idempotency_key: "event_id"
partition_by:
  - dt
output_columns:
  - event_id
  - dt
  - carrier
  - tracking_number
  - status
  - weight_lb
dq:
  not_null:
    - event_id
    - dt
  unique:
    - event_id
  range:
    weight_lb: [0, 200]
"""


@pytest.fixture()
def cfg(tmp_path):
    p = tmp_path / "ups_shipping.yaml"
    p.write_text(CFG_YAML)
    return DatasetConfig.from_yaml(str(p))


@pytest.fixture()
def raw(spark):
    rows = [
        ("e1", "2024-03-01", "UPS", "t1", "CREATED", 10.0, "extra"),
        ("e1", "2024-03-01", "UPS", "t1", "CREATED", 10.0, "dup"),  # dup key
        ("e2", "2024-03-02", "UPS", "t2", "IN_TRANSIT", 50.0, "x"),
    ]
    return spark.createDataFrame(
        rows,
        ["event_id", "dt", "carrier", "tracking_number", "status", "weight_lb", "junk"],
    )


def test_config_parse(cfg):
    assert cfg.dataset == "ups_shipping"
    assert cfg.idempotency_key == ["event_id"]
    assert cfg.dq_range == {"weight_lb": (0, 200)}


def test_config_driven_pipeline(spark, cfg, raw, tmp_path):
    silver = str(tmp_path / "silver")
    verdict = cfg.run(raw, silver)
    assert verdict["ok"] and verdict["metrics"]["row_count"] == 2
    out = spark.read.parquet(silver)
    assert out.count() == 2
    assert "junk" not in out.columns
    assert glob.glob(f"{silver}/dt=2024-03-01/*.parquet")


def test_config_dq_gate_blocks_write(spark, cfg, raw, tmp_path):
    bad = raw.withColumn(
        "weight_lb", F.when(F.col("event_id") == "e2", 999.0).otherwise(F.col("weight_lb"))
    )
    silver = str(tmp_path / "silver")
    with pytest.raises(ValueError, match="range\\(weight_lb\\)"):
        cfg.run(bad, silver)
    assert not glob.glob(f"{silver}/**/*.parquet", recursive=True), (
        "gate failure must block the write"
    )


def test_composite_idempotency_key(spark):
    cfg = DatasetConfig.from_dict(
        {"dataset": "d", "idempotency_key": "a|b", "output_columns": ["a", "b", "v"]}
    )
    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 1, "x"), (1, 2, "y")], ["a", "b", "v"]
    )
    assert cfg.dedup(df).count() == 2

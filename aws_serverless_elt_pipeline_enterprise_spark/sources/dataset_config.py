"""Declarative per-dataset ingest config (the reference's scaffold model).

The reference generalizes its pipeline with per-dataset YAML declaring
bronze/silver prefixes, an idempotency key, partition columns, output
columns, and lightweight DQ rules (configs/ups_shipping.yaml:1-42,
templates/dataset.yaml, scripts/scaffold.sh). Here the same declaration
drives a DataFrame pipeline directly — the "transform handler" the
scaffold stamps out becomes three generated stages:

    project(output_columns) -> dedup(idempotency_key) -> DQ check
    -> partitioned silver write

Everything stays declarative, so Catalyst sees one lineage per dataset.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclass
class DatasetConfig:
    dataset: str
    idempotency_key: list[str]
    partition_by: list[str] = field(default_factory=lambda: ["dt"])
    output_columns: list[str] = field(default_factory=list)
    dq_not_null: list[str] = field(default_factory=list)
    dq_unique: list[str] = field(default_factory=list)
    dq_range: dict[str, tuple[float, float]] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "DatasetConfig":
        key = d["idempotency_key"]
        keys = key.split("|") if isinstance(key, str) else list(key)
        dq = d.get("dq") or {}
        return cls(
            dataset=d["dataset"],
            idempotency_key=keys,
            partition_by=list(d.get("partition_by") or ["dt"]),
            output_columns=list(d.get("output_columns") or []),
            dq_not_null=list(dq.get("not_null") or []),
            dq_unique=list(dq.get("unique") or []),
            dq_range={k: tuple(v) for k, v in (dq.get("range") or {}).items()},
        )

    @classmethod
    def from_yaml(cls, path: str) -> "DatasetConfig":
        if yaml is None:
            raise RuntimeError("pyyaml not available")
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))

    # ------------------------------------------------------------ stages

    def project(self, df: DataFrame) -> DataFrame:
        """Keep exactly output_columns (missing -> NULL, extras dropped) —
        the reference's normalize projection, config-driven."""
        if not self.output_columns:
            return df
        have = set(df.columns)
        return df.select(
            *[
                (F.col(c) if c in have else F.lit(None)).alias(c)
                for c in self.output_columns
            ]
        )

    def dedup(self, df: DataFrame) -> DataFrame:
        return df.dropDuplicates(self.idempotency_key)

    def dq_check(self, df: DataFrame) -> dict:
        """One aggregate pass over the configured expectations; returns
        {ok, failures, metrics} like the reference's GE verdict doc."""
        aggs = [F.count(F.lit(1)).alias("row_count")]
        for c in self.dq_not_null:
            aggs.append(F.count_if(F.col(c).isNull()).alias(f"nulls__{c}"))
        for c in self.dq_unique:
            aggs.append(F.countDistinct(c).alias(f"distinct__{c}"))
            aggs.append(F.count(c).alias(f"nonnull__{c}"))
        for c, (lo, hi) in self.dq_range.items():
            aggs.append(
                F.count_if((F.col(c) < lo) | (F.col(c) > hi)).alias(f"oob__{c}")
            )
        m = df.agg(*aggs).collect()[0].asDict()
        failures = []
        for c in self.dq_not_null:
            if m[f"nulls__{c}"]:
                failures.append(f"not_null({c}): {m[f'nulls__{c}']} nulls")
        for c in self.dq_unique:
            if m[f"distinct__{c}"] != m[f"nonnull__{c}"]:
                failures.append(f"unique({c}) violated")
        for c in self.dq_range:
            if m[f"oob__{c}"]:
                failures.append(f"range({c}): {m[f'oob__{c}']} out of bounds")
        return {"ok": not failures, "failures": failures, "metrics": m}

    def run(
        self, df: DataFrame, silver_root: str, max_records_per_file: int = 5000
    ) -> dict:
        """project -> dedup -> gate -> partitioned write. Raises on DQ
        failure BEFORE anything is written (transactional, unlike the
        reference's after-the-fact gate)."""
        out = self.dedup(self.project(df))
        out.cache()
        try:
            verdict = self.dq_check(out)
            if not verdict["ok"]:
                raise ValueError(f"DQ failed for {self.dataset}: {verdict['failures']}")
            (
                out.repartition(*self.partition_by)
                .write.mode("append")
                .option("maxRecordsPerFile", str(max_records_per_file))
                .partitionBy(*self.partition_by)
                .parquet(silver_root)
            )
        finally:
            out.unpersist()
        return verdict

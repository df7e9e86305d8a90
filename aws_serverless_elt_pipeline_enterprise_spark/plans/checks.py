"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY.md §4) — everything it hand-builds
(partition pruning, column pruning, batching) Catalyst gives us for free
IF the plan is declared right. These helpers make plan quality testable:
tests assert that filters reach the parquet scan, projections prune the
read schema, small dims broadcast, and top-k compiles to
TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown proof)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan column lists actually read (column pruning proof)."""
    text = explain_str(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def has_operator(df: DataFrame, name: str) -> bool:
    return name in explain_str(df)


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer pipeline breaks).
    Simple-mode explain marks codegen'd operators with ``*(n)``."""
    text = explain_str(df, "simple")
    spans = set(re.findall(r"\*\((\d+)\)", text))
    spans |= set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    return len(spans)


def exchange_count(df: DataFrame) -> int:
    """Shuffles in the plan (simple mode: one line per operator)."""
    return explain_str(df, "simple").count("Exchange")

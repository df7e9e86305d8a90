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


def _split_top_level(body: str) -> list[str]:
    """Split on commas at bracket depth 0 only — In(col, [a,b]) and
    nested struct<...>/array<...> types must not shatter."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown proof).
    Splits on top-level commas only: ``In(op, [insert,update])`` is ONE
    filter, not two fragments."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", text):
        start = m.end()
        depth, end = 1, start
        while end < len(text) and depth:
            if text[end] == "[":
                depth += 1
            elif text[end] == "]":
                depth -= 1
            end += 1
        body = text[start : end - 1].strip()
        if body:
            out.extend(_split_top_level(body))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Filters applied to the PARTITION columns of a file scan (partition
    pruning proof — these eliminate whole directories before any file is
    opened, unlike PushedFilters which run per row group)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[", text):
        start = m.end()
        depth, end = 1, start
        while end < len(text) and depth:
            if text[end] == "[":
                depth += 1
            elif text[end] == "]":
                depth -= 1
            end += 1
        body = text[start : end - 1].strip()
        if body:
            out.extend(_split_top_level(body))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan TOP-LEVEL column lists actually read (column pruning
    proof). Bracket-matched, so array</map</nested-struct typed columns
    neither truncate the capture nor leak inner fields as columns."""
    text = explain_str(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<", text):
        start = m.end()
        depth, end = 1, start
        while end < len(text) and depth:
            if text[end] == "<":
                depth += 1
            elif text[end] == ">":
                depth -= 1
            end += 1
        body = text[start : end - 1]
        scans.append(
            [c.split(":", 1)[0].strip() for c in _split_top_level(body) if c]
        )
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
    """SHUFFLE exchanges in the plan (simple mode: one line per
    operator). A bare substring count also matched BroadcastExchange
    (zero shuffles) and ReusedExchange (a reused one, not a second
    shuffle) — the token must start the operator name."""
    return len(re.findall(r"(?:^|[^A-Za-z])Exchange[ (]", explain_str(df, "simple")))

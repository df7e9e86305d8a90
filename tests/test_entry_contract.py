"""Driver-contract simulation: run every queries() entry at sf0.001 and
compare against oracle_sql() in DuckDB the way the driver does —
row count, column names, and order-insensitive exact values (columns
sorted by name, rows sorted)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm(row[i]) for i in idx) for row in data],
        key=lambda r: tuple(str(x) for x in r),
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_contract(spark, sf_dir, name):
    q = entry_mod.queries()[name]
    df = q(spark, sf_dir)
    spark_cols = df.columns
    spark_data = [tuple(r) for r in df.collect()]
    assert len(spark_data) >= 0  # must execute

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract: stable schema + executes
        assert all(isinstance(c, str) and c for c in spark_cols)
        return

    con = _duck(sf_dir)
    res = con.sql(sql)
    duck_cols = res.columns
    duck_data = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_data) == len(duck_data), (
        f"{name}: row count {len(spark_data)} vs {len(duck_data)}"
    )
    got = _rows(spark_cols, spark_data)
    want = _rows(duck_cols, duck_data)
    mismatches = [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches, first: {mismatches[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["user_id", "last_event_id", "last_event_type", "last_value"]

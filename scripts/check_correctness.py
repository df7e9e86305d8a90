"""Local stand-in for the driver's correctness gate: runs each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compares row
count, schema (column names) and values (columns sorted by name, rows
sorted, string-rendered with dtype tag — approximates the driver's
canonical hash, including its dtype sensitivity).

Usage: python scripts/check_correctness.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple[list[str], pd.DataFrame, list[str]]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    # normalize like the driver does: datetime unit and int width don't
    # matter (round-1 evidence: int32-vs-int64 and ns-vs-us hash-matched),
    # int-vs-float DOES (revenue failed on exactly that)
    for c in cols:
        s = out[c]
        if str(s.dtype).startswith("datetime64"):
            out[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and all(
            type(v).__name__ == "date" for v in s.dropna().head(5)
        ):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif str(s.dtype).startswith(("int", "uint")):
            out[c] = s.astype("int64")
    out = out.sort_values(cols).reset_index(drop=True)
    dtypes = [str(out[c].dtype) for c in cols]
    return cols, out, dtypes


def main() -> int:
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    unknown = only - set(entry_mod.queries())
    if unknown:
        # a typo'd name would otherwise match nothing and exit 0 — a
        # false-green correctness gate
        print(f"FAIL unknown query names: {sorted(unknown)}")
        return 1
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf}/{t}.parquet"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        scols, sc, sdt = canon(sdf)
        ocols, oc, odt = canon(odf)
        if len(sc) != len(oc):
            print(f"FAIL {name}: rows {len(sc)} vs {len(oc)}")
            n_bad += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            n_bad += 1
            continue
        if sdt != odt:
            print(f"FAIL {name}: dtypes {dict(zip(scols, sdt))} vs {dict(zip(ocols, odt))}")
            n_bad += 1
            continue
        mism = []
        for c in scols:
            if not (sc[c].astype(str) == oc[c].astype(str)).all():
                mism.append(c)
        if mism:
            print(f"FAIL {name}: value mismatch in {mism}")
            for c in mism[:2]:
                bad = sc[c].astype(str) != oc[c].astype(str)
                print(
                    pd.DataFrame(
                        {"spark": sc[c][bad], "oracle": oc[c][bad]}
                    ).head(3)
                )
            n_bad += 1
        else:
            print(f"PASS {name} (rows={len(sc)})")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

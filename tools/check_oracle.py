"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, column set, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # Int64/int64 unify; NaN for nulls
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"cols spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if va.dtype.kind == "f":
            na, nb = np.isnan(va), np.isnan(vb)
            exact = np.array_equal(na, nb) and np.array_equal(va[~na], vb[~nb])
            close = np.array_equal(na, nb) and np.allclose(va[~na], vb[~nb], rtol=1e-9, atol=1e-9)
            if not exact:
                tag = "CLOSE-NOT-EXACT" if close else "MISMATCH"
                bad = int((~np.isclose(va, vb, rtol=1e-9, atol=1e-9, equal_nan=True)).sum())
                problems.append(f"{c}: {tag} ({bad} values differ beyond 1e-9)")
        else:
            if not np.array_equal(va, vb):
                problems.append(f"{c}: value mismatch")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from spark_pit.queries import ORACLES, QUERIES
    from spark_pit.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {str(e)[:500]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"[rows-only] {name}: {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {str(e)[:500]}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        hard = [p for p in problems if "CLOSE-NOT-EXACT" not in p]
        if hard:
            print(f"[FAIL] {name}: {problems}")
            failures += 1
        elif problems:
            print(f"[WARN] {name}: {problems}")
        else:
            print(f"[OK]   {name}: {len(spark_pdf)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

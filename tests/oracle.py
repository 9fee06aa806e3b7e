"""Local DuckDB-oracle comparison, mirroring the driver's t2 check:
row-count + column-name set + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.decode("utf-8", "replace") if isinstance(v, (bytes, bytearray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # exact: the driver hash-compares values, so we must too
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "q"):
    actual = spark_df.toPandas()
    expected = con.execute(sql).fetchdf()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: columns differ: spark={sorted(actual.columns)} "
        f"oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count differs: spark={len(actual)} oracle={len(expected)}"
    )
    a, e = _canon(actual), _canon(expected)
    for col in a.columns:
        av, ev = a[col].tolist(), e[col].tolist()
        for i, (x, y) in enumerate(zip(av, ev)):
            assert _values_equal(x, y), (
                f"{name}: value mismatch col={col} row={i}: spark={x!r} oracle={y!r}"
            )
    return len(actual)

"""Replica of the driver's Spark-vs-DuckDB compare: row count, schema
(column names), and an order-insensitive value hash.

Normalization mirrors what a hash-based compare forces on us anyway:
columns sorted by name, rows sorted by all columns, timestamps to ns,
exact equality (queries are responsible for rounding floats so double
reassociation noise cannot flip values).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from odc_stac_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[ns]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9) + 0.0  # normalize -0.0
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: schema mismatch\n spark={list(got.columns)}\n oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = np.isclose(
                g.astype("float64"), w.astype("float64"), rtol=0, atol=1e-8, equal_nan=True
            )
        else:
            ok = (g == w) | (g.isna() & w.isna())
        if not bool(np.all(ok)):
            bad = np.where(~np.asarray(ok))[0][:5]
            detail = "\n".join(
                f"  row {i}: spark={g.iloc[i]!r} oracle={w.iloc[i]!r}" for i in bad
            )
            raise AssertionError(f"{name}: column {c!r} mismatch:\n{detail}")

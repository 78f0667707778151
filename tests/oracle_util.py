"""Differential comparison of a Spark DataFrame against DuckDB oracle SQL.

This mirrors (and is stricter than) the driver's t2 check: row count,
column names, and cell values — compared order-insensitively (rows
sorted by all columns, columns aligned by name), values compared
EXACTLY (floats must be bit-identical; the engine's determinism
contract in functions/numeric.py is what makes that achievable).

The reference repo uses the same discipline: run the distributed job
and the sequential oracle, sort both outputs, byte-compare
(main/test-mr.sh:90-98).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from go_map_reduce_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(x):
    import datetime

    if x is None or x is pd.NaT or (isinstance(x, float) and math.isnan(x)):
        return None
    if isinstance(x, datetime.datetime):
        return x.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(x, datetime.date):
        return x.strftime("%Y-%m-%d 00:00:00.000000")
    if hasattr(x, "tolist") and not isinstance(x, str):
        return tuple(x.tolist())
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return x


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f").where(s.notna(), None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(_canon_cell)
    sort_keys = [df[c].map(repr) for c in df.columns]
    order = pd.DataFrame({i: k for i, k in enumerate(sort_keys)}).sort_values(list(range(len(sort_keys)))).index
    return df.loc[order].reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str, float_ulps: bool = True) -> None:
    """Assert the Spark result equals the DuckDB oracle result exactly."""
    actual = _canon(spark_df.toPandas())
    con = duckdb_connect(sf_dir)
    try:
        expected = _canon(con.sql(sql).df())
    finally:
        con.close()

    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(e):
            for i, (x, y) in enumerate(zip(a.astype(float), e.astype(float))):
                if x is None or y is None or (math.isnan(x) and math.isnan(y)):
                    continue
                assert x == y, (
                    f"float mismatch col={c} row={i}: spark={x!r} oracle={y!r} "
                    f"diff={abs(x - y)!r}"
                )
        else:
            an = a.astype(object).where(pd.notna(a), None)
            en = e.astype(object).where(pd.notna(e), None)
            # pandas null semantics make None != None true; a cell matches
            # when equal OR both null
            mism = (an != en) & ~(an.isna() & en.isna())
            if mism.any():
                i = int(mism.idxmax())
                raise AssertionError(
                    f"value mismatch col={c} row={i}: spark={a[i]!r} oracle={e[i]!r}"
                )

"""DuckDB-oracle comparison harness.

Approximates the verification driver's check (per the repo contract):
run the Spark DataFrame and the oracle SQL over the same parquet
tables, then compare row count + column names + an order-insensitive
value comparison with floats rounded to 7 decimals (FIXTURES.md §4).
Used by the test suite so a CORRECTNESS_r{N}.json failure is caught
locally first.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from . import TABLES

FLOAT_DECIMALS = 7


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A connection with the driver's table views pre-registered."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, (pd.Timestamp,)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    if hasattr(v, "tolist") and getattr(v, "ndim", 0):  # numpy array
        return tuple(_normalize_cell(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return _normalize_cell(v.item())
    return v


def normalize_frame(df: pd.DataFrame) -> list[tuple]:
    """Column-name-sorted, float-rounded, row-sorted value tuples."""
    df = df[sorted(df.columns)]
    rows = [
        tuple(_normalize_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty → match)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = normalize_frame(spark_pdf), normalize_frame(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            f"  spark={s!r}\n  oracle={o!r}"
            for s, o in zip(s_rows, o_rows)
            if s != o
        ][:5]
        extra = ""
        if len(s_rows) == len(o_rows):
            n_bad = sum(1 for s, o in zip(s_rows, o_rows) if s != o)
            extra = f" ({n_bad}/{len(s_rows)} rows differ)"
        problems.append("value mismatch" + extra + ":\n" + "\n".join(diffs))
    return problems


def check_query(spark, sf_dir: str, fn, oracle: str) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    return compare(spark_pdf, oracle_pdf)

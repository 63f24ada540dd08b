"""Shared Spark-vs-DuckDB comparison used by tests and scripts/check_oracle.py.

Mirrors the driver's check: row count, column-name set, and an
order-insensitive value comparison with columns sorted by name.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from data_integration_pipelines_spark.catalog import TABLES
from data_integration_pipelines_spark.plans.base import Query


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        else:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for the strict gate.

    The driver's value-hash is dtype-sensitive (a DOUBLE column hashes
    differently from a BIGINT column holding the same numbers), so the
    local gate must reject float-vs-int drift instead of coercing it.
    """
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    for c in sorted(spark_pdf.columns):
        sc, oc = _dtype_class(spark_pdf[c]), _dtype_class(oracle_pdf[c])
        if sc != oc:
            return False, (
                f"dtype class differs for col {c}: spark={sc}"
                f"({spark_pdf[c].dtype}) oracle={oc}({oracle_pdf[c].dtype})"
            )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or not _values_equal(x, y):
                return False, f"col {c} row {i}: spark={x!r} oracle={y!r}"
    return True, f"{len(spark_pdf)} rows"


def compare_query(spark, q: Query, sf_dir: str) -> tuple[bool, str]:
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        return len(spark_pdf) >= 0, f"rows-only: {len(spark_pdf)} rows"
    oracle_pdf = duckdb_run(q.oracle, sf_dir)
    return compare_frames(spark_pdf, oracle_pdf)

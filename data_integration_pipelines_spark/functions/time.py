"""Timezone-robust event-time helpers.

Parquet timestamps arrive as TIMESTAMP (isAdjustedToUTC=true) or
TIMESTAMP_NTZ (naive wall-clock, Spark >= 3.4 infers the NTZ type when
``spark.sql.parquet.inferTimestampNTZ.enabled`` is on). ``unix_micros``
only accepts TIMESTAMP, and casting NTZ -> TIMESTAMP silently injects
the session timezone — a wrong answer, not an error. These helpers
dispatch on the actual column dtype and stay timezone-independent on
both paths:

- TIMESTAMP      -> ``unix_micros(col)`` (stored value IS UTC micros)
- TIMESTAMP_NTZ  -> ``timestampdiff(MICROSECOND, NTZ epoch, col)``
  (pure wall-clock arithmetic; never consults the session timezone)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def epoch_us_expr(colname: str, dtype: str) -> Column:
    """Epoch microseconds for a timestamp column of known dtype.

    ``colname`` may be a nested path (``w.start``); ``dtype`` is the
    Spark simpleString of the column's type (``timestamp`` /
    ``timestamp_ntz``).
    """
    if dtype.startswith("timestamp_ntz"):
        return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {colname})")
    return F.expr(f"unix_micros({colname})")


def ts_dtype(df: DataFrame, col: str) -> str:
    """simpleString dtype of a (top-level) column."""
    return dict(df.dtypes)[col]


def epoch_us(df: DataFrame, col: str = "ts") -> Column:
    """Epoch microseconds of ``df[col]``, NTZ- and LTZ-safe."""
    return epoch_us_expr(col, ts_dtype(df, col))


def epoch_sec(df: DataFrame, col: str = "ts") -> Column:
    """Epoch seconds, truncated per-timestamp (matches CAST(ts AS LONG)
    semantics on TIMESTAMP and DuckDB date_diff('second', ...) when
    differenced)."""
    return F.floor(epoch_us(df, col) / F.lit(1_000_000))

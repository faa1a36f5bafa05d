"""Timestamp-type-agnostic epoch extraction.

The testdata parquet surfaces ``ts`` as TIMESTAMP_NTZ (micros,
isAdjustedToUTC=false); Spark's ``unix_micros``/``cast(long)`` reject
NTZ at analysis time, and casting NTZ→LTZ first would make the value
depend on the session timezone. NTZ is instead measured against the
NTZ epoch literal — timezone-free on any session — while LTZ keeps
``unix_micros``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column, dtype_name: str) -> Column:
    """Epoch microseconds for a timestamp column of either flavor.

    ``dtype_name`` is ``DataType.typeName()`` of the input column
    (``"timestamp"`` or ``"timestamp_ntz"``) — dispatch must happen at
    plan-build time because the two flavors need different expressions.
    """
    if dtype_name == "timestamp_ntz":
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", epoch, col)
    return F.unix_micros(col)


def epoch_seconds(col: Column, dtype_name: str) -> Column:
    """Floor-seconds epoch (matches ``floor(epoch(ts))`` in DuckDB and
    the LTZ ``cast(ts AS LONG)`` truncation semantics)."""
    return F.floor(epoch_micros(col, dtype_name) / F.lit(1_000_000)).cast("long")

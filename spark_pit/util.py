"""Small shared expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_us(col: str | Column) -> Column:
    """Timestamp (NTZ or LTZ) → epoch microseconds (bigint).

    TIMESTAMP_NTZ cannot cast to numeric directly; route through
    TIMESTAMP_LTZ — the session timezone is pinned to UTC (session.py), so
    NTZ↔LTZ is the identity mapping and this matches DuckDB's epoch_us().
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp_ltz"))

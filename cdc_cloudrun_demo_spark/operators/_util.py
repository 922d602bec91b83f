"""Shared helpers for oracle-parity-safe aggregation.

Cross-engine float discipline: Spark and DuckDB sum doubles in different
orders, so raw double aggregates differ in the last ulps and break exact
value-hash comparison. We therefore sum in DECIMAL (exact, associative)
and cast the final result back to DOUBLE. Scale-2/6 decimal cast
boundaries are non-dyadic, so double→decimal casts can never tie and both
engines round identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dec6(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum, returned as double (matches oracle SQL pattern
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Order-insensitive average: exact decimal sum ÷ count, in double
    (oracle: ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


# SQL-side templates (DuckDB dialect) for the same discipline
def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"

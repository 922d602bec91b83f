"""Shared helpers for oracle-parity-safe aggregation.

Cross-engine float discipline: Spark and DuckDB sum doubles in different
orders, so raw double aggregates differ in the last ulps and break exact
value-hash comparison. Discipline: scale to 10^s, round, sum as BIGINT
(exact, associative, order-insensitive), divide back at the end. Both
engines compute the identical IEEE-754 product `x * 10^s` and round it
half-away-from-zero, so the scaled integers — and therefore the sums —
are bit-identical across engines.

Why longs and not DECIMAL: long sums stay inside whole-stage codegen's
primitive path (a single `+` per row); decimal sums go through Decimal
objects and measured ~6× slower on the hot aggregate. Validity envelope:
exact while `rows × max|x| × 10^s < 2^63` — at scale-6 and TPC-H-like
magnitudes that is ~9e7 rows per aggregate (≈ sf30 on one node's worth of
groups). Past that, partial sums per partition still fit and the merge
side should switch to DECIMAL(38,s) — `dec_sum` below is that fallback;
flip `dsum = dec_sum` for the ultra-scale build.
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


def scaled_long(col: str | Column, scale: int = 2) -> Column:
    """Exact integer representation: floor(x · 10^scale + 0.5) as BIGINT.

    floor(+0.5) instead of round(): Spark's round() on doubles detours
    through BigDecimal per row (~2× the whole aggregate's cost); floor is
    a primitive codegen op. Half-way cases resolve toward +inf on BOTH
    engines (identical IEEE expression), so cross-engine equality holds
    for any sign; data here is non-negative so it equals round-half-up."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(10**scale) + F.lit(0.5)).cast("long")


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum, returned as double (matches oracle SQL
    ``CAST(SUM(CAST(FLOOR(x * 10^s + 0.5) AS BIGINT)) AS DOUBLE) / 10^s``)."""
    return F.sum(scaled_long(col, scale)) / F.lit(float(10**scale))


def davg(col: str | Column, scale: int = 2) -> Column:
    """Order-insensitive average: exact scaled-long sum ÷ non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dec_sum(col: str | Column, scale: int = 2) -> Column:
    """DECIMAL-path exact sum — the overflow-proof fallback for aggregates
    whose scaled magnitude can exceed 2^63 (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


# SQL-side templates (DuckDB dialect) for the same discipline
def sql_dsum(expr: str, scale: int = 2) -> str:
    # CAST the long sum to DOUBLE *before* dividing: double/double division
    # is what Spark compiles `sum(long) / lit(float)` to. Leaving the long
    # sum bare lets DuckDB pick decimal division (context-dependent result
    # scale/type), which breaks exact cross-engine comparison.
    f = 10**scale
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * {f} + 0.5) AS BIGINT)) AS DOUBLE) / {f}.0)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"

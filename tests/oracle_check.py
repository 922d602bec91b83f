"""Replica of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() twin on DuckDB over the same parquet, compare
row count + schema shape + order-insensitive values.

Stricter than the driver (exact value equality after canonical
normalization) so that passing here predicts passing there.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from cdc_cloudrun_demo_spark.catalog import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    mismatches: list = field(default_factory=list)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


_SCALAR_OK = (str, bytes, bytearray, bool, int, float, type(None))


def assert_driver_sortable(pdf: pd.DataFrame, side: str, name: str) -> None:
    """Fail loudly if any output cell is not scalar-sortable.

    The driver canonicalizes BOTH frames with pandas ``sort_values``
    before hashing; a list/ndarray/dict cell makes that raise
    "unhashable type" and the whole entry hard-errors (round-5:
    `sim_pq_codes` spark-side, `fn_map_ops` oracle-side). The old local
    replica str-sorted such cells, so local green failed to predict
    driver green — this assertion closes that gap: every output column
    of every entry (oracled AND rows-only) must contain only scalar
    cells (str/bytes/date/datetime/Decimal/bool/int/float/None)."""
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype != object:
            continue
        for v in s:
            if v is None or isinstance(v, _SCALAR_OK):
                continue
            if hasattr(v, "isoformat"):  # date/datetime/Timestamp/time
                continue
            import decimal

            if isinstance(v, decimal.Decimal):
                continue
            if isinstance(v, float) and math.isnan(v):
                continue
            try:
                if v is pd.NaT or pd.isna(v):
                    continue
            except (TypeError, ValueError):
                pass
            raise AssertionError(
                f"{name}: {side} column {col!r} has non-scalar cell "
                f"{type(v).__name__} — the driver cannot sort it; emit "
                f"scalar columns (explode / concat_ws / struct fields)"
            )


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Tag the numeric kind: the driver hashes stringified values, so
        # int64 3 vs HUGEINT->float64 3.0 is a driver FAIL even though
        # Python's 3.0 == 3 would hide it here. Keep kinds distinct.
        return ("f", float(v))
    if isinstance(v, pd.Timestamp):
        ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
        return ts.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return v


def _canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare_one(spark, con, name: str, fn, sql: str, sf_dir: str) -> CompareResult:
    try:
        sdf = fn(spark, sf_dir).toPandas()
    except Exception as e:
        return CompareResult(name, False, f"SPARK ERROR: {type(e).__name__}: {e}")
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        return CompareResult(name, False, f"ORACLE ERROR: {type(e).__name__}: {e}")
    assert_driver_sortable(sdf, "spark", name)
    assert_driver_sortable(odf, "oracle", name)
    r = CompareResult(name, True, spark_rows=len(sdf), oracle_rows=len(odf))
    if sorted(sdf.columns) != sorted(odf.columns):
        r.ok = False
        r.detail = f"COLUMNS spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        return r
    if len(sdf) != len(odf):
        r.ok = False
        r.detail = f"ROWCOUNT spark={len(sdf)} oracle={len(odf)}"
        return r
    s_rows = _canon_frame(sdf)
    o_rows = _canon_frame(odf)
    if s_rows != o_rows:
        r.ok = False
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:3]
        r.detail = f"VALUES differ; first diffs: {diffs}"
        r.mismatches = diffs
    return r

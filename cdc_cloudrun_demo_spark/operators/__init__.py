"""Operator families (SURVEY.md §2 inventory).

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL string). ``registry()``
merges them for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from . import (
        aggregates,
        analytics,
        bench_ops,
        cdc,
        joins,
        metrics,
        relational,
        sampling,
        scalar_fns,
        setops,
        streaming_batch,
        windows,
    )
    from ..functions import dedup, similarity, text
    from ..sources import multimodal

    modules = [
        relational,
        metrics,
        bench_ops,
        cdc,
        joins,
        aggregates,
        analytics,
        windows,
        setops,
        scalar_fns,
        sampling,
        streaming_batch,
        dedup,
        similarity,
        text,
        multimodal,
    ]
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        q = getattr(m, "QUERIES", {})
        o = getattr(m, "ORACLES", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        queries.update(q)
        oracles.update(o)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles

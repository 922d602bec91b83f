"""Operator families (SURVEY.md §2 inventory).

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL string). ``registry()``
merges them for ``__spark_entry__``.

Registry ordering matters: the correctness driver sweeps the FIRST 50
entries in registry order per round. Rounds 1–2 verified the 50 names in
``_DRIVER_VERIFIED`` below (see CORRECTNESS_r01/r02.json — all green).
``registry()`` therefore stable-partitions never-driver-verified entries
to the front so each round's sweep reaches fresh names; already-proven
entries keep their green rows from earlier rounds and sit at the tail.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Names with a green row in CORRECTNESS_r01.json / CORRECTNESS_r02.json
# (driver 50-entry sweeps, rounds 1 and 2). Do NOT add names here without
# a corresponding driver-green row — this set only demotes entries that
# already have driver proof.
_DRIVER_VERIFIED = frozenset(
    {
        "agg_approx_distinct",
        "agg_approx_percentiles",
        "agg_conditional_sums",
        "agg_cube_counts",
        "agg_distinct_counts",
        "agg_percentiles",
        "agg_pricing_summary",
        "agg_rollup_revenue",
        "agg_stats_moments",
        "agg_string_concat",
        "agg_top_customers",
        "agg_value_histogram",
        "b1_mean_duration",
        "b2_warm_mean",
        "b3_extremes",
        "b4_group_by_image",
        "b5_jvm_native_ratio",
        "b6_comparison_table",
        "b7_validity_gated_mean",
        "b8_json_extract",
        "b9_time_deltas",
        "cdc_keygen",
        "cdc_materialize",
        "cdc_materialize_streaming",
        "cdc_op_stats",
        "cdc_scd2_history",
        "cdc_snapshot_asof",
        "cdc_tombstone_keys",
        "join_anti",
        "join_asof",
        "join_broadcast_dim",
        "join_full_outer",
        "join_interval_bucketed",
        "join_left_outer",
        "join_salted_skew",
        "join_scalar_subquery",
        "join_semi",
        "join_star_revenue",
        "join_theta_range",
        "m1_derived_metrics",
        "m2_nested_json",
        "m3_classification",
        "s1_scan_all",
        "s1_scan_projection",
        "s2_point_lookup",
        "s2_point_lookup_absent",
        "s6_count_star",
        "s7_first_row",
        "s8_health_probe",
        "s9_metadata",
    }
)


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
        schema_evolution,
        setops,
        streaming_batch,
        windows,
    )
    from ..functions import dedup, similarity, text
    from ..sources import jdbc_io, multimodal

    # Module order sets priority WITHIN the unverified partition (and is
    # cosmetic within the verified tail). aggregates sits BEFORE windows
    # so its three unverified entries (agg_grouping_sets — round-2 verdict
    # task 8 — plus agg_mode / agg_hll_merge) land inside the driver's
    # 50-entry window; the window then ends 4 entries into
    # streaming_batch, so gap_fill/sliding/session/hourly rotate into a
    # later round. jdbc_io / schema_evolution lead: brand-new code is the
    # highest-risk content for the driver sweep.
    modules = [
        jdbc_io,
        schema_evolution,
        dedup,
        similarity,
        text,
        multimodal,
        aggregates,
        windows,
        streaming_batch,
        analytics,
        setops,
        scalar_fns,
        sampling,
        relational,
        metrics,
        bench_ops,
        cdc,
        joins,
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
    # Stable partition: never-driver-verified names first so the driver's
    # bounded sweep reaches them; proven names keep module order at the tail.
    ordered = sorted(queries, key=lambda n: n in _DRIVER_VERIFIED)
    queries = {n: queries[n] for n in ordered}
    return queries, oracles

"""Data-layout optimization: Z-order (Morton) clustering keys.

At 100 TB the cheapest scan is the one that never happens: parquet
row-group min/max statistics prune files, but only for columns the data
is clustered on. Sorting on one column gives perfect pruning for that
column and none for any other; interleaving the bits of TWO columns
(Z-order, the technique behind Delta's OPTIMIZE ZORDER BY and Iceberg's
sort orders) gives useful pruning on both at once. This module computes
the key; writers `orderBy(zkey)` before writing and every min/max-stat
consumer benefits with no further engine support.

The key is pure integer arithmetic (min/max normalization to 16 bits via
integer division, then bit interleaving) so the DuckDB oracle reproduces
it bit-for-bit — and the same expression runs unchanged on a cluster.
The locality claim itself (fewer files overlap a predicate range under
Z-order than under single-column sort) is proven against real parquet
footer statistics in tests/test_pipeline_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_BITS = 16


def _interleave_sql(a: str, b: str, shift_op: str) -> str:
    """The 2×16-bit Morton interleave as portable SQL. `a` contributes
    even bits, `b` odd bits. Identical text modulo the integer-shift
    dialect (Spark: shiftleft/shiftright functions; DuckDB: << >>)."""
    terms = []
    for i in range(_BITS):
        if shift_op == "fn":
            terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)  # disjoint bits: + == OR, and + folds better


def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (l_orderkey, l_partkey): each key min/max-normalizes
    to 16 bits with exact integer division (no float boundary anywhere),
    then the bits interleave. Plan: one tiny global min/max aggregate
    broadcast back onto a NARROW per-row expression — the corpus never
    shuffles to get its layout key; the optional `orderBy(zkey)` a writer
    adds is the one range exchange any clustering rewrite costs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bounds = li.agg(
        F.min("l_orderkey").alias("o_mn"),
        F.max("l_orderkey").alias("o_mx"),
        F.min("l_partkey").alias("p_mn"),
        F.max("l_partkey").alias("p_mx"),
    )
    with_bounds = li.crossJoin(F.broadcast(bounds))
    scale = (1 << _BITS) - 1
    # greatest(span, 1): a constant clustering column has span 0, and
    # both Spark `div` and DuckDB `//` return NULL on /0 — the guard
    # makes the normalized value 0 (a degenerate-but-defined key) instead
    # of NULLing every zkey; the oracle applies the same guard.
    # widen BEFORE the multiply: (col - mn) on a 32-bit column times the
    # scale overflows INT silently under non-ANSI arithmetic for spans
    # above ~32k, scrambling z-keys with no error (round-9 advice);
    # DuckDB auto-promotes, so the oracle needs no twin change
    a = (
        f"CAST(l_orderkey - o_mn AS BIGINT) * {scale}"
        f" div greatest(CAST(o_mx - o_mn AS BIGINT), 1)"
    )
    b = (
        f"CAST(l_partkey - p_mn AS BIGINT) * {scale}"
        f" div greatest(CAST(p_mx - p_mn AS BIGINT), 1)"
    )
    return with_bounds.select(
        "l_orderkey",
        "l_partkey",
        F.expr(
            _interleave_sql(f"({a})", f"({b})", "fn")
        ).cast("long").alias("zkey"),
    )


ZORDER_ORACLE = f"""
    WITH bounds AS (
        SELECT MIN(l_orderkey) AS o_mn, MAX(l_orderkey) AS o_mx,
               MIN(l_partkey) AS p_mn, MAX(l_partkey) AS p_mx
        FROM lineitem
    ), normed AS (
        SELECT l_orderkey, l_partkey,
               ((l_orderkey - o_mn) * {(1 << _BITS) - 1}) // greatest(o_mx - o_mn, 1) AS na,
               ((l_partkey - p_mn) * {(1 << _BITS) - 1}) // greatest(p_mx - p_mn, 1) AS nb
        FROM lineitem CROSS JOIN bounds
    )
    SELECT l_orderkey, l_partkey,
           CAST({_interleave_sql('na', 'nb', 'op')} AS BIGINT) AS zkey
    FROM normed
"""

_HBITS = 8  # Hilbert grid: 2^8 x 2^8 cells, key in [0, 2^16)
_HSIDE = 1 << _HBITS


def hilbert_step_exprs(level: int, x: str, y: str, d: str) -> tuple[str, str, str]:
    """One unrolled level of the standard Hilbert xy→d walk (the
    public-domain Wikipedia formulation), as PORTABLE integer SQL:
    no xor operator anywhere — Spark's `^` is XOR while DuckDB's `^` is
    POWER, so `(3·rx) xor ry` is expanded to its closed CASE form
    (rx=0 → ry; rx=1 → 3-ry). Quadrant rotation folds the conditional
    swap/reflect into two CASE projections. All +,-,*,&,CASE — identical
    text in both engines."""
    s = 1 << level
    rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
    d_new = f"({d} + {s * s} * (CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END))"
    x_new = (
        f"(CASE WHEN {ry} = 0 THEN"
        f" (CASE WHEN {rx} = 1 THEN {_HSIDE - 1} - {y} ELSE {y} END)"
        f" ELSE {x} END)"
    )
    y_new = (
        f"(CASE WHEN {ry} = 0 THEN"
        f" (CASE WHEN {rx} = 1 THEN {_HSIDE - 1} - {x} ELSE {x} END)"
        f" ELSE {y} END)"
    )
    return x_new, y_new, d_new


def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (l_orderkey, l_partkey) — the
    locality-stronger sibling of `layout_zorder_key` (a Hilbert walk
    never jumps: consecutive keys are always Manhattan-adjacent cells,
    where Morton order teleports at quadrant seams, so range predicates
    overlap fewer files; this is why Delta/Iceberg grew HILBERT
    clustering next to ZORDER). Same plan shape as the Morton key: one
    tiny min/max bounds aggregate broadcast onto a NARROW per-row
    expression — the corpus never shuffles to get its key. The 8-level
    walk is unrolled into chained integer projections (Catalyst
    constant-folds and fuses them into one codegen stage); the identical
    step text runs as chained CTE projections in the DuckDB oracle, so
    the key is hash-checked bit-for-bit. Bijectivity on the full grid
    and the unit-step adjacency property are tested directly in
    tests/test_pipeline_ops.py."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bounds = li.agg(
        F.min("l_orderkey").alias("o_mn"),
        F.max("l_orderkey").alias("o_mx"),
        F.min("l_partkey").alias("p_mn"),
        F.max("l_partkey").alias("p_mx"),
    )
    scale = _HSIDE - 1
    with_bounds = li.crossJoin(F.broadcast(bounds)).select(
        "l_orderkey",
        "l_partkey",
        F.expr(  # widen before multiply — overflow guard, round-9 advice
            f"CAST(l_orderkey - o_mn AS BIGINT) * {scale}"
            f" div greatest(CAST(o_mx - o_mn AS BIGINT), 1)"
        ).alias("hx"),
        F.expr(
            f"CAST(l_partkey - p_mn AS BIGINT) * {scale}"
            f" div greatest(CAST(p_mx - p_mn AS BIGINT), 1)"
        ).alias("hy"),
    )
    cur = with_bounds.withColumn("hd", F.lit(0).cast("long"))
    for level in range(_HBITS - 1, -1, -1):
        x_new, y_new, d_new = hilbert_step_exprs(level, "hx", "hy", "hd")
        cur = cur.select(
            "l_orderkey",
            "l_partkey",
            F.expr(x_new).alias("hx"),
            F.expr(y_new).alias("hy"),
            F.expr(d_new).alias("hd"),
        )
    return cur.select(
        "l_orderkey", "l_partkey", F.col("hd").cast("long").alias("hkey")
    )


def _hilbert_oracle() -> str:
    scale = _HSIDE - 1
    steps = []
    prev = "lvl_in"
    for i, level in enumerate(range(_HBITS - 1, -1, -1)):
        x_new, y_new, d_new = hilbert_step_exprs(level, "hx", "hy", "hd")
        steps.append(
            f", lvl{i} AS (SELECT l_orderkey, l_partkey,"
            f" {x_new} AS hx, {y_new} AS hy, {d_new} AS hd FROM {prev})"
        )
        prev = f"lvl{i}"
    return f"""
        WITH bounds AS (
            SELECT MIN(l_orderkey) AS o_mn, MAX(l_orderkey) AS o_mx,
                   MIN(l_partkey) AS p_mn, MAX(l_partkey) AS p_mx
            FROM lineitem
        ), lvl_in AS (
            SELECT l_orderkey, l_partkey,
                   ((l_orderkey - o_mn) * {scale}) // greatest(o_mx - o_mn, 1) AS hx,
                   ((l_partkey - p_mn) * {scale}) // greatest(p_mx - p_mn, 1) AS hy,
                   0 AS hd
            FROM lineitem CROSS JOIN bounds
        ){''.join(steps)}
        SELECT l_orderkey, l_partkey, CAST(hd AS BIGINT) AS hkey FROM {prev}
    """


_COMPACT_TARGET = 100  # rows per compacted output file (≈ the 1 GB knob)


def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/bin-packing
    maintenance pass every table format (Delta OPTIMIZE, Iceberg
    rewrite_data_files) runs: group undersized files into target-sized
    output files. Input "files" are the per-day write units of the
    orders table (one file per ingest day — the natural output of the
    streaming sink); the plan assigns each to a compacted output bin of
    ~_COMPACT_TARGET rows via monotone-cursor packing: within a month
    partition, files ordered (size desc, day) are packed by
    bin = running_size_before div target — the deterministic,
    one-window-pass equivalent of sorted first-fit that real OPTIMIZE
    implementations use per partition.

    Scale shape: this is METADATA-scale work — one row per file, not
    per record — and the window is PARTITIONED BY MONTH because real
    compaction never crosses table partitions (a cross-partition bin
    would break partition pruning for every reader). So the sort is
    per-month over file counts, never a global single-reducer pass, and
    the plan for a 100 TB table is a few million rows total. Exact
    integer sizes and `div` packing → full hash-match oracle."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("part_month"),
        F.date_trunc("day", F.col("o_orderdate")).alias("file_day"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return files.select(
        "part_month",
        "file_day",
        "n_rows",
        F.expr(
            f"coalesce(sum(n_rows) over (partition by part_month"
            f" order by n_rows desc, file_day asc"
            f" rows between unbounded preceding and 1 preceding), 0)"
            f" div {_COMPACT_TARGET}"
        ).cast("long").alias("target_file"),
    )


COMPACTION_ORACLE = f"""
    WITH files AS (
        SELECT date_trunc('month', o_orderdate) AS part_month,
               date_trunc('day', o_orderdate) AS file_day,
               COUNT(*) AS n_rows
        FROM orders GROUP BY 1, 2
    )
    SELECT part_month, file_day, n_rows,
           CAST(COALESCE(SUM(n_rows) OVER (PARTITION BY part_month
               ORDER BY n_rows DESC, file_day ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {_COMPACT_TARGET} AS BIGINT) AS target_file
    FROM files
"""


_NFILES = 64  # simulated files per layout
_PK_LO, _PK_HI = 200, 400  # the probe predicate: l_partkey BETWEEN lo AND hi


def layout_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified file-skipping: how many of 64 simulated data files a
    ``l_partkey BETWEEN 200 AND 400`` scan can prune under (a) the
    natural l_orderkey layout vs (b) the Z-order layout — the number
    that justifies a clustering rewrite BEFORE paying for it (Delta's
    OPTIMIZE ZORDER dry-run question). Files are value-range buckets of
    the layout key — a pure function of the key via the broadcast
    min/max (same two-phase shape as cdc_keygen: no global sort, no
    single-reducer exchange, deterministic across engines, unlike a
    range-sampled repartition). Zone maps are one (layout, file)
    aggregate over the keyed rows — min/max/count of the probe column,
    exactly what parquet footers store; a file is pruned when its
    [min,max] misses the predicate. Output: 2 rows (layout, n_files,
    n_pruned, rows_total, rows_scanned), all exact integers, fully
    hash-oracled. The real-footer twin of this simulation is proven in
    tests/test_pipeline_ops.py against actual parquet statistics."""
    zdf = layout_zorder_key(spark, sf_dir)  # (l_orderkey, l_partkey, zkey)
    out = None
    for layout, key in (("natural", "l_orderkey"), ("zorder", "zkey")):
        bounds = zdf.agg(F.min(key).alias("mn"), F.max(key).alias("mx"))
        file_id = F.expr(
            f"least({_NFILES - 1}, CAST({key} - mn AS BIGINT) * {_NFILES}"
            f" div greatest(CAST(mx - mn AS BIGINT), 1))"
        )
        zones = (
            zdf.crossJoin(F.broadcast(bounds))
            .select(file_id.alias("file_id"), "l_partkey")
            .groupBy("file_id")
            .agg(
                F.min("l_partkey").alias("pk_min"),
                F.max("l_partkey").alias("pk_max"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
        pruned = (F.col("pk_max") < _PK_LO) | (F.col("pk_min") > _PK_HI)
        summary = zones.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(pruned, 1).otherwise(0)).cast("long").alias("n_pruned"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.when(~pruned, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
        )
        out = summary if out is None else out.unionByName(summary)
    return out


def _zone_map_oracle() -> str:
    per_layout = []
    for layout, key in (("natural", "l_orderkey"), ("zorder", "zkey")):
        per_layout.append(f"""
        SELECT '{layout}' AS layout, COUNT(*) AS n_files,
               CAST(SUM(CASE WHEN pk_max < {_PK_LO} OR pk_min > {_PK_HI}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
               CAST(SUM(n_rows) AS BIGINT) AS rows_total,
               CAST(SUM(CASE WHEN pk_max < {_PK_LO} OR pk_min > {_PK_HI}
                        THEN 0 ELSE n_rows END) AS BIGINT) AS rows_scanned
        FROM (
            SELECT file_id, MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
                   COUNT(*) AS n_rows
            FROM (
                SELECT LEAST({_NFILES - 1},
                             (({key} - mn_{layout}) * {_NFILES})
                             // GREATEST(mx_{layout} - mn_{layout}, 1))
                         AS file_id,
                       l_partkey
                FROM zkeys CROSS JOIN bounds_{layout}
            ) GROUP BY file_id
        )""")
    bounds = ", ".join(
        f"bounds_{layout} AS (SELECT MIN({key}) AS mn_{layout},"
        f" MAX({key}) AS mx_{layout} FROM zkeys)"
        for layout, key in (("natural", "l_orderkey"), ("zorder", "zkey"))
    )
    return (
        f"WITH zkeys AS ({ZORDER_ORACLE}), {bounds} "
        + " UNION ALL ".join(per_layout)
    )


QUERIES = {
    "layout_zone_map_prune": layout_zone_map_prune,
    "layout_compaction_plan": layout_compaction_plan,
    "layout_hilbert_key": layout_hilbert_key,
    "layout_zorder_key": layout_zorder_key,
}

ORACLES = {
    "layout_zone_map_prune": _zone_map_oracle(),
    "layout_compaction_plan": COMPACTION_ORACLE,
    "layout_hilbert_key": _hilbert_oracle(),
    "layout_zorder_key": ZORDER_ORACLE,
}

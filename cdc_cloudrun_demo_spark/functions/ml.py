"""ML-adjacent operators on sufficient statistics: closed-form ridge
regression and classifier evaluation — the one-pass, exact-arithmetic
patterns a training-data pipeline runs at corpus scale.

The reference has no ML surface; its nearest analog is the warm-up
trend its bench harness eyeballs (`test_warm_performance.sh:65-76`,
answered properly by `b10_regression_trend`). These entries generalize
that to the two shapes every data-curation stack needs: fitting a small
linear model over billions of rows WITHOUT iterating (sufficient
statistics: one scan reduces the corpus to a handful of exact integer
sums; the solve is O(d³) on constants), and scoring a cheap heuristic
classifier against labels (confusion counts — the quality-filter
calibration loop).

Scale shape: both entries are single-scan map-side-combined aggregates —
the corpus collapses to ONE row of BIGINT sums (order-insensitive,
exact), and the float algebra runs on that row only, so no double ever
accumulates across rows and the cross-engine hash holds bit-exactly.
Overflow envelope: the largest sum is Σ(x·y) ≈ rows × 5e8, inside int64
to ~sf1000; past that the partial sums switch to DECIMAL(38,0) (same
fallback as `operators/_util.dec_sum`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

# The solve runs on ONE row of exact integer sums; the expression text
# is shared verbatim between the Spark query and the DuckDB oracle so
# both engines execute the identical IEEE-754 operation tree — same
# inputs, same order, same bits. Ridge λ = 1000 (on the scaled-integer
# design: quantity in units, discount in hundredths, price in cents).
_RIDGE_DET = (
    "((CAST(s11 AS DOUBLE) + 1000.0) * (CAST(s22 AS DOUBLE) + 1000.0)"
    " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
)
_RIDGE_B1 = (
    "(((CAST(s22 AS DOUBLE) + 1000.0) * CAST(s1y AS DOUBLE)"
    f" - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE)) / {_RIDGE_DET})"
)
_RIDGE_B2 = (
    "(((CAST(s11 AS DOUBLE) + 1000.0) * CAST(s2y AS DOUBLE)"
    f" - CAST(s12 AS DOUBLE) * CAST(s1y AS DOUBLE)) / {_RIDGE_DET})"
)

_RIDGE_STATS = """
    SELECT COUNT(*) AS n,
           CAST(SUM(x1 * x1) AS BIGINT) AS s11,
           CAST(SUM(x2 * x2) AS BIGINT) AS s22,
           CAST(SUM(x1 * x2) AS BIGINT) AS s12,
           CAST(SUM(x1 * y) AS BIGINT) AS s1y,
           CAST(SUM(x2 * y) AS BIGINT) AS s2y
    FROM (
        SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x1,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x2,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM {lineitem}
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL
    )
"""

_RIDGE_SOLVE = f"""
    SELECT n AS n_rows, s11, s22, s12, s1y, s2y,
           {_RIDGE_B1} AS beta_qty,
           {_RIDGE_B2} AS beta_disc
    FROM ridge_stats
"""


def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (2 features, no intercept) fit in ONE pass via
    the normal equations: y = price_cents, x = (quantity, discount_pct),
    β = (XᵀX + λI)⁻¹Xᵀy. The scan reduces to six exact BIGINT sums
    (map-side combined, one exchange of one row); the 2×2 solve is a
    constant-time double expression evaluated from those exact integers
    — the identical expression text runs on the oracle side, so the
    result hashes bit-exactly. This is how a linear probe / quality
    scorer is REALLY fit at 100 TB: no gradient loop touches the data;
    d² sufficient statistics summarize it losslessly."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("ml_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW ridge_stats AS "
        + _RIDGE_STATS.format(lineitem="ml_lineitem")
    )
    return spark.sql(_RIDGE_SOLVE)


ML_RIDGE_ORACLE = (
    "WITH ridge_stats AS (" + _RIDGE_STATS.format(lineitem="lineitem") + ")"
    + _RIDGE_SOLVE
)

# Shared eval expressions (same bit-exact discipline as the ridge solve).
_PRECISION = "(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
_RECALL = "(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
_F1 = f"(2.0 * {_PRECISION} * {_RECALL} / ({_PRECISION} + {_RECALL}))"

_CONFUSION_COUNTS = """
    SELECT CAST(SUM(CASE WHEN pred = 1 AND actual = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN pred = 1 AND actual = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN pred = 0 AND actual = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN pred = 0 AND actual = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM (
        SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS pred,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS actual
        FROM {lineitem}
        WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL
    )
"""

_CONFUSION_SOLVE = f"""
    SELECT tp, fp, fn, tn,
           {_PRECISION} AS precision_,
           {_RECALL} AS recall_,
           {_F1} AS f1
    FROM conf_counts
"""


def ml_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation at corpus scale: confusion counts +
    precision/recall/F1 for a heuristic label predictor (here: predict
    'returned' when discount ≥ 5% — the calibration question a
    quality-filter pipeline asks of every cheap heuristic before
    trusting it to gate data). One conditional-sum scan, one exchange
    of one 4-long row; the ratio metrics are constant-time doubles from
    exact integers with oracle-identical expression text."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("mlc_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW conf_counts AS "
        + _CONFUSION_COUNTS.format(lineitem="mlc_lineitem")
    )
    return spark.sql(_CONFUSION_SOLVE)


ML_CONFUSION_ORACLE = (
    "WITH conf_counts AS (" + _CONFUSION_COUNTS.format(lineitem="lineitem") + ")"
    + _CONFUSION_SOLVE
)


QUERIES = {
    "ml_ridge_closed_form": ml_ridge_closed_form,
    "ml_eval_confusion": ml_eval_confusion,
}

ORACLES = {
    "ml_ridge_closed_form": ML_RIDGE_ORACLE,
    "ml_eval_confusion": ML_CONFUSION_ORACLE,
}

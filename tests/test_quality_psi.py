"""PSI drift-gate semantics on controlled corpora: identical segments
score zero, a location-shifted segment scores past the industry
investigate threshold, and out-of-range current values clamp into the
edge bins instead of vanishing (operators/quality.py::dq_drift_psi)."""

from __future__ import annotations

import os

from cdc_cloudrun_demo_spark.operators.quality import dq_drift_psi

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _corpus(spark, tmp_path, name, values_ref, values_cur):
    rows = [
        (2 * i, None, 0, "t", float(v), None) for i, v in enumerate(values_ref)
    ] + [
        (2 * i + 1, None, 0, "t", float(v), None)
        for i, v in enumerate(values_cur)
    ]
    d = str(tmp_path / name)
    os.makedirs(d)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def _psi(spark, corpus):
    rows = dq_drift_psi(spark, corpus).collect()
    assert len(rows) == 10
    return sum(r["psi_term_micro"] for r in rows) / 1e6


def test_psi_zero_on_identical_segments(spark, tmp_path):
    vals = [i % 50 for i in range(500)]
    corpus = _corpus(spark, tmp_path, "same", vals, vals)
    assert _psi(spark, corpus) == 0.0  # equal counts → ratio 1 → ln 0


def test_psi_flags_shifted_segment(spark, tmp_path):
    ref = [i % 50 for i in range(500)]
    cur = [25 + (i % 50) for i in range(500)]  # half the mass shifts right
    corpus = _corpus(spark, tmp_path, "shift", ref, cur)
    assert _psi(spark, corpus) > 0.25  # the standard investigate threshold


def test_psi_clamps_out_of_range_current(spark, tmp_path):
    ref = [i % 50 for i in range(500)]
    cur = [-1000.0] * 250 + [1000.0] * 250  # entirely outside ref bounds
    corpus = _corpus(spark, tmp_path, "clamp", ref, cur)
    rows = {r["bin"]: r for r in dq_drift_psi(spark, corpus).collect()}
    assert rows[0]["n_cur"] == 250 and rows[9]["n_cur"] == 250
    assert sum(r["n_cur"] for r in rows.values()) == 500  # nothing vanished
    assert _psi(spark, corpus) > 0.25

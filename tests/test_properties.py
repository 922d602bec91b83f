"""Property-based tests (hypothesis): the CDC fold against a first-
principles Python model, and plan-equivalence of the salted top-k.

Bounded example counts — each example runs Spark jobs, so the budget is
spent on structural variety (op mixes, replays, interleavings), not volume.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_cloudrun_demo_spark.streaming.cdc_stream import fold_batch, merge_states

CHANGE_SCHEMA = "seq long, op string, id long, content string, ts timestamp"

_ops = st.sampled_from(["INSERT", "UPDATE", "DELETE"])
_events = st.lists(
    st.tuples(_ops, st.integers(min_value=1, max_value=5), st.text("ab", max_size=3)),
    min_size=1,
    max_size=12,
)


def _model_fold(events: list[tuple[int, str, int, str]]) -> dict[int, tuple[str, int]]:
    """Reference model: dict fold in seq order, tombstones drop keys."""
    state: dict[int, tuple[str, int]] = {}
    for seq, op, key, content in sorted(events):
        if op == "DELETE":
            state.pop(key, None)
        else:
            state[key] = (content, seq)
    return state


def _rows(events):
    t0 = datetime(2024, 1, 1)
    return [
        (seq, op, key, content, t0 + timedelta(minutes=seq))
        for seq, op, key, content in events
    ]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events)
def test_cdc_fold_matches_model(spark, raw):
    events = [(i + 1, op, key, c) for i, (op, key, c) in enumerate(raw)]
    df = spark.createDataFrame(_rows(events), CHANGE_SCHEMA)
    folded = fold_batch(df).filter("op <> 'DELETE'")
    got = {r["id"]: (r["content"], r["last_seq"]) for r in folded.collect()}
    # fold_batch keeps the latest op per key; the model also drops keys
    # whose latest op is DELETE — which fold_batch's filter reproduces
    assert got == _model_fold(events)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events, _events)
def test_cdc_merge_is_incremental(spark, raw_a, raw_b):
    """Folding the whole log at once == folding two slices and merging."""
    a = [(i + 1, op, key, c) for i, (op, key, c) in enumerate(raw_a)]
    b = [(len(a) + i + 1, op, key, c) for i, (op, key, c) in enumerate(raw_b)]
    df_all = spark.createDataFrame(_rows(a + b), CHANGE_SCHEMA)
    df_a = spark.createDataFrame(_rows(a), CHANGE_SCHEMA)
    df_b = spark.createDataFrame(_rows(b), CHANGE_SCHEMA)

    whole = {
        r["id"]: (r["content"], r["last_seq"])
        for r in fold_batch(df_all).filter("op <> 'DELETE'").collect()
    }
    empty = spark.createDataFrame(
        [], "id long, content string, last_seq long, updated_at timestamp"
    )
    staged = merge_states(merge_states(empty, fold_batch(df_a)), fold_batch(df_b))
    got = {r["id"]: (r["content"], r["last_seq"]) for r in staged.collect()}
    assert got == whole

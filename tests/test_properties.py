"""Property-based tests (hypothesis): the CDC merge algebra checked
against a naive Python model on randomized change streams — the
load-generator role the reference fills with Locust (SURVEY §5),
but deterministic and adversarial."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_cdc_spark.cdc.apply import apply_changes
from lakehouse_cdc_spark.operators.dedup import latest_per_key

# a change: (key, value, op, seq) — seq is the total order
changes_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # few keys → collisions
        st.integers(min_value=0, max_value=100),
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=0, max_value=1000),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda c: c[3],  # unique seq → total order
)

base_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)


def model_apply(base: list, changes: list) -> dict:
    """Naive single-threaded reference semantics: last change per key
    wins; final 'd' removes; unmatched non-d inserts."""
    state = {k: v for k, v in base}
    latest: dict = {}
    for k, v, op, seq in changes:
        if k not in latest or seq > latest[k][2]:
            latest[k] = (v, op, seq)
    for k, (v, op, _) in latest.items():
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(base=base_strategy, changes=changes_strategy)
def test_apply_changes_matches_model(spark, base, changes):
    base_df = spark.createDataFrame(base, "k int, v int") if base else (
        spark.createDataFrame([], "k int, v int")
    )
    ch_df = spark.createDataFrame(
        changes, "k int, v int, operation string, seq int"
    ) if changes else spark.createDataFrame(
        [], "k int, v int, operation string, seq int"
    )
    got = {
        r.k: r.v
        for r in apply_changes(base_df, ch_df, keys=["k"], order_by=["seq"]).collect()
    }
    assert got == model_apply(base, changes)


@pytest.mark.slow
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(changes=changes_strategy)
def test_latest_per_key_is_partition_invariant(spark, changes):
    """Compaction must be a pure function of the data, not of the
    physical partitioning — the invariance that makes it safe on any
    cluster size."""
    if not changes:
        return
    df = spark.createDataFrame(changes, "k int, v int, operation string, seq int")
    one = {
        (r.k, r.seq)
        for r in latest_per_key(df.coalesce(1), ["k"], ["seq"]).collect()
    }
    many = {
        (r.k, r.seq)
        for r in latest_per_key(df.repartition(7), ["k"], ["seq"]).collect()
    }
    assert one == many

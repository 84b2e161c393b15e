"""Unit tests for relational operators and the query registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators import (
    anti_join,
    latest_per_key,
    semi_join,
    table_checksum_stats,
)
from lakehouse_cdc_spark.plans import REGISTRY


def test_latest_per_key_basic(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k int, o int, v string"
    )
    rows = latest_per_key(df, ["k"], ["o"]).orderBy("k").collect()
    assert [(r.k, r.v) for r in rows] == [(1, "b"), (2, "c")]


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    semi = {r.k for r in semi_join(left, right, "k").collect()}
    anti = {r.k for r in anti_join(left, right, "k").collect()}
    assert semi == {2, 3}
    assert anti == {1}
    assert semi | anti == {1, 2, 3}  # semi ∪ anti partitions left


def test_checksum_stats_partition_invariant(spark):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "a int, b string")
    one = table_checksum_stats(df.coalesce(1)).collect()[0]
    many = table_checksum_stats(df.repartition(8)).collect()[0]
    assert one == many


def test_checksum_xor_catches_midrange_change(spark):
    """A single changed row whose old/new hashes are neither the min
    nor the max signature leaves (count, distinct, min, max) untouched
    — xor_sig is the content aggregate that still flips."""
    base = [(i, f"v{i}") for i in range(100)]
    df = spark.createDataFrame(base, "a int, b string")
    ref = table_checksum_stats(df).collect()[0]
    # mutate rows until we find one whose change is invisible to the
    # four order stats (expected ~ (N-4)/N of the time)
    for i in range(100):
        mutated = [(a, "CHANGED" if a == i else b) for a, b in base]
        mdf = spark.createDataFrame(mutated, "a int, b string")
        got = table_checksum_stats(mdf).collect()[0]
        if (
            got.row_cnt == ref.row_cnt
            and got.distinct_sigs == ref.distinct_sigs
            and got.min_sig == ref.min_sig
            and got.max_sig == ref.max_sig
        ):
            assert got.xor_sig != ref.xor_sig
            return
    raise AssertionError("every mutation moved min/max — fixture too small?")


def test_hll_mergeable_rollup_accuracy(spark, sf_dir):
    """Unioned per-day HLL sketches must estimate the whole-range
    distinct count within 5% of exact — the contract that makes
    sketch rollups a safe substitute for rescanning raw data."""
    from lakehouse_cdc_spark.plans.registry import table

    rows = REGISTRY["agg_hll_mergeable_rollup"].fn(spark, sf_dir).collect()
    exact = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # the query now carries the bound as data: the emitted exact count
    # must agree with an independent recount, and every within-5% flag
    # must hold (the oracle gate hash-verifies the same flags)
    assert rows[0].range_distinct_exact == exact
    assert all(r.range_within_5pct for r in rows)
    assert all(r.day_within_5pct for r in rows)
    # no day can see more distinct users than the whole range
    assert all(r.day_distinct_exact <= exact for r in rows)


def test_registry_complete():
    """Every registered query has a callable; oracle strings are
    non-empty when present."""
    assert len(REGISTRY) >= 30
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    """Smoke: every declared query executes and returns a stable schema
    at sf0.001."""
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.columns  # schema resolves
    df.limit(5).collect()


def test_entry_contract(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0
    qs = ent.queries()
    os_ = ent.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30

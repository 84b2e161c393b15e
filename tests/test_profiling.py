"""Tests for the profiling / percentile / z-order wave."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans import REGISTRY


def test_profiler_is_one_scan(spark, sf_dir):
    plan = (
        REGISTRY["profile_table_summary"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1


def test_profiler_values(spark, sf_dir):
    rows = {r["col_name"]: r for r in REGISTRY["profile_table_summary"].fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    }
    ok = rows["o_orderkey"]
    assert ok["n_nulls"] == 0
    assert int(ok["min_repr"]) <= int(ok["max_repr"])


def test_percentiles_are_monotone_per_group(spark, sf_dir):
    rows = REGISTRY["agg_exact_percentiles"].fn(spark, sf_dir).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], {})[r["q_pct"]] = r["pct_value"]
    for status, qs in by_status.items():
        assert set(qs) == {0.25, 0.5, 0.75}, status
        assert qs[0.25] <= qs[0.5] <= qs[0.75], status


def test_zorder_buckets_are_local_in_both_dims(spark, sf_dir):
    """The point of z-order: per-bucket extents must be narrow in BOTH
    dimensions simultaneously (a linear sort is narrow in one only).
    With 16-bit dims bucketed at >>16, each bucket spans at most 256
    values of each dimension."""
    rows = REGISTRY["layout_zorder_clustering"].fn(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert r["max_ck"] - r["min_ck"] <= 256, r
        assert r["max_dd"] - r["min_dd"] <= 256, r

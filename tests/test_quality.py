"""Tests for validation operators and maintenance utilities."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakehouse_cdc_spark.maintenance import (
    compact_table,
    expire_snapshots,
    remove_orphan_files,
)
from lakehouse_cdc_spark.quality import (
    freshness_lag,
    missing_keys,
    row_count_diff,
    run_suite,
    sample_match_rate,
)
from lakehouse_cdc_spark.streaming import SnapshotUpsertSink


def test_row_count_diff_flags_drift(spark):
    src = spark.range(1000)
    tgt = spark.range(990)  # 1% off
    row = row_count_diff(src, tgt).collect()[0]
    assert row.source_cnt == 1000 and row.target_cnt == 990
    assert not row.within_tolerance
    ok = row_count_diff(src, spark.range(1000)).collect()[0]
    assert ok.within_tolerance


def test_row_count_diff_empty_source_not_vacuous(spark):
    """Empty source vs non-empty target must FAIL the tolerance check
    (it used to report diff_pct=0.0 → vacuous pass)."""
    empty = spark.range(0)
    row = row_count_diff(empty, spark.range(10)).collect()[0]
    assert row.diff_pct == 1.0 and not row.within_tolerance
    both_empty = row_count_diff(empty, spark.range(0)).collect()[0]
    assert both_empty.diff_pct == 0.0 and both_empty.within_tolerance


def test_missing_keys_anti_join(spark):
    src = spark.range(10).withColumnRenamed("id", "k")
    tgt = src.filter(F.col("k") % 3 != 0)
    missing = {r.k for r in missing_keys(src, tgt, ["k"]).collect()}
    assert missing == {0, 3, 6, 9}


def test_sample_match_rate_detects_corruption(spark):
    src = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    tgt = src.withColumn(
        "v", F.when(F.col("k") == 0, F.lit(-1.0)).otherwise(F.col("v"))
    )
    row = sample_match_rate(
        src, tgt, ["k"], ["v"], sample_pred=F.col("k") % 10 == 0
    ).collect()[0]
    assert row.sampled == 10
    assert row.matched == 9  # k=0 corrupted
    assert abs(row.match_rate - 0.9) < 1e-9


def test_sample_match_rate_duplicate_target_keys(spark):
    """Duplicate keys in the target must not fan out the join and
    inflate sampled/matched — the rate is per sampled key, and a key
    only matches if ALL its target duplicates match."""
    src = spark.createDataFrame([(0, 1.0), (10, 2.0)], "k int, v double")
    # k=0 duplicated in target: one matching copy, one corrupted copy
    tgt = spark.createDataFrame(
        [(0, 1.0), (0, -1.0), (10, 2.0)], "k int, v double"
    )
    row = sample_match_rate(
        src, tgt, ["k"], ["v"], sample_pred=F.lit(True)
    ).collect()[0]
    assert row.sampled == 2  # per-key, not per joined pair (3)
    assert row.matched == 1  # k=0 has a mismatching duplicate
    assert abs(row.match_rate - 0.5) < 1e-9


def test_run_suite_grades_all_bands(spark):
    """The suite runner must hit Good (all pass), Warning (4/5) and
    Poor, with the reference's >=95 / >=80 thresholds."""
    src = spark.createDataFrame(
        [(i, float(i), "2024-01-0%d" % (1 + i % 9)) for i in range(100)],
        "k int, v double, d string",
    )
    every = F.lit(True)

    # identical target → 5/5 Good
    good = run_suite(
        src, src, ["k"], ["v"], ts_col="d", sample_pred=every
    ).collect()[0]
    assert good.overall_status == "Good" and good.success_rate == 100.0

    # two corrupted values (98% < 99%) → sampling fails → 4/5 → Warning
    tgt = src.withColumn(
        "v", F.when(F.col("k").isin(3, 4), -1.0).otherwise(F.col("v"))
    )
    warn = run_suite(
        src, tgt, ["k"], ["v"], ts_col="d", sample_pred=every
    ).collect()[0]
    assert warn.overall_status == "Warning" and warn.n_passed == 4

    # corrupted + 10% of rows missing + stale max-date → 2/5 → Poor
    bad = tgt.filter(F.col("k") % 10 != 0).withColumn(
        "d", F.lit("2023-12-31")
    )
    poor = run_suite(
        src, bad, ["k"], ["v"], ts_col="d", sample_pred=every
    ).collect()[0]
    assert poor.overall_status == "Poor"
    assert not poor.row_count_ok and not poor.missing_ok and not poor.fresh_ok


def test_freshness_lag_zero_for_newest_group(spark, sf_dir):
    from lakehouse_cdc_spark.plans.registry import table

    lags = freshness_lag(
        table(spark, sf_dir, "events"), "ts", ["event_type"]
    ).collect()
    assert min(r.lag_s for r in lags) == 0  # some group owns the newest event
    assert all(r.lag_s >= 0 for r in lags)


def test_compact_table_preserves_data(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(1000).repartition(16).write.parquet(p)
    n_before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    compact_table(spark, p, target_files=2)
    n_after = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert n_before == 16 and n_after == 2
    assert spark.read.parquet(p).count() == 1000


def test_expire_snapshots_keeps_committed(spark, tmp_path):
    sink = SnapshotUpsertSink(str(tmp_path / "s"), keys=["id"], order_by=["seq"])
    import datetime

    for b in range(8):
        df = spark.createDataFrame(
            [(1, f"v{b}", "u", b)], "id int, v string, operation string, seq int"
        )
        sink.process_batch(df, b)
    expired = expire_snapshots(sink.target_dir, retain_last=3)
    assert expired == [0, 1, 2, 3, 4]
    assert sink.committed_version() == 7
    assert sink.current_table(spark).collect()[0].v == "v7"


def test_remove_orphan_files(tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    (d / "keep.parquet").write_text("x")
    (d / "junk.compacting").mkdir()
    (d / "_VERSION.tmp").write_text("9")
    removed = remove_orphan_files(str(d))
    assert sorted(removed) == ["_VERSION.tmp", "junk.compacting"]
    assert (d / "keep.parquet").exists()


def test_observe_quality_free_in_pass_metrics(spark, sf_dir):
    """Observation counters must equal a dedicated aggregation pass —
    but arrive as a side-effect of the action the caller already ran."""
    from pyspark.sql import functions as F

    from lakehouse_cdc_spark.plans.registry import table
    from lakehouse_cdc_spark.quality.validation import observe_quality

    df = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("den")
    )
    observed, obs = observe_quality(df, ["den"], name="orders_quality")
    n_out = observed.count()  # the "real work" action
    got = obs.get
    want_nulls = df.filter(F.col("den").isNull()).count()
    assert got["rows"] == n_out
    assert got["nulls_den"] == want_nulls and want_nulls > 0


def test_streaming_observe_metrics_reach_listener(spark, tmp_path):
    """df.observe on a STREAM: per-batch counters must surface in the
    progress events the listener records — validation without a
    second pass, per micro-batch."""
    import time as _time

    from pyspark.sql import functions as F

    from lakehouse_cdc_spark.sources.cdclog import register_cdclog
    from lakehouse_cdc_spark.streaming.monitor import (
        ProgressHistoryListener,
        attach_progress_listener,
    )

    register_cdclog(spark)
    hist = ProgressHistoryListener()
    handle = attach_progress_listener(spark, hist)
    try:
        stream = (
            spark.readStream.format("cdclog")
            .option("n", "300").option("batch", "100")
            .option("parts", "2").option("keys", "30")
            .load()
            .observe(
                "envelope_quality",
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("null_values"),
            )
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("observe_probe")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = _time.time() + 120
        while _time.time() < deadline and hist.total_input_rows() < 300:
            _time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
    finally:
        spark.streams.removeListener(handle)

    per_batch = [
        p["observed"]["envelope_quality"]
        for p in hist.progresses
        if p["input_rows"] and "envelope_quality" in p["observed"]
    ]
    assert [m["rows"] for m in per_batch] == [100, 100, 100]
    assert all(m["null_values"] == 0 for m in per_batch)

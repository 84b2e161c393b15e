"""Sketch guarantees the oracle can't see: one-sided Count-Min error
over EVERY key (not just the top-20), and the Bloom no-false-negative
contract under membership recomputation."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans import REGISTRY
from lakehouse_cdc_spark.plans.registry import table
from lakehouse_cdc_spark.plans.sketch_queries import (
    _BF_HASHES,
    _CM_DEPTH,
    _CM_SPARK,
)

SF = "/root/testdata/sf0.001"


def test_countmin_never_undercounts_any_key(spark):
    li = table(spark, SF, "lineitem").select(F.col("l_partkey").alias("k"))
    depths = F.explode(F.array(*[F.lit(i) for i in range(_CM_DEPTH)])).alias("d")
    cells = (
        li.select("k", depths)
        .select("d", F.expr(_CM_SPARK).alias("b"))
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    truth = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = (
        truth.select("k", "true_cnt", depths)
        .select("k", "true_cnt", "d", F.expr(_CM_SPARK).alias("b"))
        .join(cells, ["d", "b"])
        .groupBy("k", "true_cnt")
        .agg(F.min("cell_cnt").alias("est"))
        .collect()
    )
    assert est  # every key hits a populated cell in all 4 rows
    assert all(r.est >= r.true_cnt for r in est)


def test_countmin_query_overcount_column(spark):
    rows = REGISTRY["sketch_countmin_heavy_hitters"].fn(spark, SF).collect()
    assert len(rows) == 20
    assert all(r.overcount >= 0 and r.cm_est == r.true_cnt + r.overcount for r in rows)


def test_bloom_has_no_false_negatives_and_prunes(spark):
    row = REGISTRY["sketch_bloom_join_prune"].fn(spark, SF).collect()[0]
    assert row.n_false_neg == 0  # the Bloom guarantee
    assert row.n_maybe + row.n_definite_no == row.n_probed
    assert row.n_member <= row.n_maybe
    assert row.n_false_pos == row.n_maybe - row.n_member
    # the filter must actually prune something on this fixture
    assert row.n_definite_no > 0


def test_bloom_bitmap_is_mergeable(spark):
    """bit_or partials over any split of the member set produce the
    identical bitmap — the property that makes the build map-side."""
    from lakehouse_cdc_spark.plans.sketch_queries import _BF_POS_SPARK, _BF_WORD

    member = (
        table(spark, SF, "customer")
        .filter(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1).isin("0", "1")
        )
        .select(F.col("c_custkey").alias("k"))
    )
    hashes = F.explode(F.array(*[F.lit(i) for i in range(_BF_HASHES)])).alias("i")

    def bitmap(df):
        return {
            (r.word, r.w_bits)
            for r in df.select("k", hashes)
            .select(F.expr(_BF_POS_SPARK).alias("pos"))
            .select(
                (F.col("pos") / _BF_WORD).cast("bigint").alias("word"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BF_WORD} AS INT))"
                ).alias("mask"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(mask)").alias("w_bits"))
            .collect()
        }

    whole = bitmap(member)
    halves = bitmap(member.repartition(7))  # any partitioning
    assert whole == halves


def test_kmv_sketch_is_partial_limited_and_bounded(spark):
    """The bottom-k build must compile to WindowGroupLimit (each map
    task forwards <= k rows per source pre-shuffle) and the estimate
    must be a valid Jaccard in [0, 1] with matches <= k."""
    from lakehouse_cdc_spark.plans.sketch_queries import _KMV_K

    q = REGISTRY["sketch_kmv_jaccard"]
    df = q.fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    assert rows, "expected at least one source pair"
    for r in rows:
        assert 0 <= r.kmv_matches <= _KMV_K
        assert 0.0 <= r.jac_kmv <= 1.0
        assert 0.0 <= r.jac_exact <= 1.0


def test_histogram_quantile_error_is_bounded_by_bucket_width(spark):
    from lakehouse_cdc_spark.plans.sketch_queries import _HQ_W

    rows = REGISTRY["sketch_histogram_quantiles"].fn(spark, SF).collect()
    assert {r.q_pct for r in rows} == {50, 90, 99}
    for r in rows:
        # the rank-th value must land inside the estimated bucket
        assert 0 <= r.err_cents < _HQ_W
        assert r.est_lo_cents <= r.exact_cents


def test_zone_map_skipping_is_lossless(spark):
    r = REGISTRY["maintenance_zone_map_skipping"].fn(spark, SF).collect()[0]
    assert r.rows_missed == 0  # zone pruning must never drop a match
    assert r.files_scanned + r.files_skipped == r.files_total
    assert r.rows_scanned >= r.rows_matching


def test_ohlc_is_partition_invariant(spark):
    """open/close picks ride a total order, so any input partitioning
    must produce the identical candle set."""
    q = REGISTRY["ts_downsample_ohlc"]
    base = {tuple(r) for r in q.fn(spark, SF).collect()}
    # force a different physical layout through the same plan
    from lakehouse_cdc_spark.plans.timeseries_queries import _V100
    from pyspark.sql import Window

    ev = table(spark, SF, "events").repartition(13).sortWithinPartitions("value")
    w_open = Window.partitionBy("event_type", "day").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    w_close = Window.partitionBy("event_type", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    alt = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.expr(_V100).alias("v"),
            "ts",
            "event_id",
        )
        .select(
            "event_type",
            "day",
            "v",
            F.row_number().over(w_open).alias("rn_open"),
            F.row_number().over(w_close).alias("rn_close"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn_open") == 1, F.col("v"))).alias("open_c"),
            F.max("v").alias("high_c"),
            F.min("v").alias("low_c"),
            F.max(F.when(F.col("rn_close") == 1, F.col("v"))).alias("close_c"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "day")
    )
    assert base == {tuple(r) for r in alt.collect()}


def test_approx_percentile_within_one_percent(spark):
    """The GK sketch's quantiles must sit within 1% relative error of
    the exact interpolated percentiles at accuracy 10000."""
    r = REGISTRY["agg_approx_percentile_dual"].fn(spark, SF).collect()[0]
    for q in ("p50", "p90", "p99"):
        # the query carries the bound as a flag column (hash-verified
        # against the oracle's TRUE); the exact cents must be sane
        assert r[f"{q}_within_1pct"] is True, q
        assert r[f"{q}_exact_cents"] > 0, q
    # percentiles are monotone
    assert (
        r.p50_exact_cents <= r.p90_exact_cents <= r.p99_exact_cents
    )

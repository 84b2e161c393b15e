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

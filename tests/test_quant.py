"""Tests for int8 embedding quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans import REGISTRY
from lakehouse_cdc_spark.plans.registry import table


def test_int8_range_bound(spark, sf_dir):
    """Symmetric quantization must land every component in [-127, 127]
    (one extra guard: floor(x·s + 0.5) at x = -max could give -127
    exactly, never -128)."""
    e = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    scale = 127.0 / F.array_max(F.transform(vec, lambda x: F.abs(x)))
    q = e.select(
        F.transform(vec, lambda x: F.floor(x * scale + 0.5).cast("bigint")).alias("q")
    )
    mx = q.select(
        F.max(F.array_max("q")).alias("hi"),
        F.min(F.array_min("q")).alias("lo"),
    ).collect()[0]
    assert mx["hi"] <= 127
    assert mx["lo"] >= -127


def test_int8_topk_selfmatch_and_accuracy(spark, sf_dir):
    rows = REGISTRY["emb_int8_quantize_topk"].fn(spark, sf_dir).collect()
    assert rows[0]["vec_id"] == 0  # the query vector ranks itself first
    assert abs(rows[0]["cos_q"] - 1.0) < 1e-6
    # int8 ranking must track the exact cosine closely on every hit
    for r in rows:
        assert abs(r["cos_q"] - r["cos_exact"]) < 0.01, r


def test_pq_adc_partition_invariant_and_sane(spark, sf_dir):
    """PQ codes/ADC are exact integer arithmetic: the top-10 must be
    identical under any partitioning, and every ADC distance must be
    a nonnegative sum of 8 LUT cells."""
    rows = REGISTRY["emb_pq_adc_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.adc_dist >= 0 and r.exact_dist >= 0 for r in rows)
    assert 0 not in {r.vec_id for r in rows}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = REGISTRY["emb_pq_adc_topk"].fn(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]

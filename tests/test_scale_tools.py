"""Tests for the scale toolbox: partitioned writes (pruning), salted
joins (skew), stream monitoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.joins import equi_join, salted_join
from lakehouse_cdc_spark.plans.registry import table
from lakehouse_cdc_spark.sources import read_partitioned, write_time_partitioned
from lakehouse_cdc_spark.streaming import cdc_pipeline  # noqa: F401  (import check)
from lakehouse_cdc_spark.streaming.monitor import lag_alert, query_progress


def test_write_time_partitioned_prunes(spark, sf_dir, tmp_path):
    e = table(spark, sf_dir, "events")
    path = str(tmp_path / "events_part")
    write_time_partitioned(e, path, "ts")

    back = read_partitioned(spark, path)
    assert back.count() == e.count()

    pruned = back.filter((F.col("year") == "2024") & (F.col("month") == "01"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # january 2024 is the whole fixture → same count; the filter must
    # not silently drop data
    assert pruned.count() == e.count()
    miss = back.filter(F.col("month") == "12")
    assert miss.count() == 0


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 0
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(0, "hot"), (950, "cold")], "k bigint, name string"
    )
    plain = equi_join(left, right, "k").groupBy("k", "name").count()
    salted = salted_join(left, right, "k").groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_outer_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "dim1")], "k int, name string")
    rows = salted_join(left, right, "k", how="left").orderBy("k").collect()
    assert [(r.k, r.name) for r in rows] == [(1, "dim1"), (2, None)]


def test_query_progress_from_live_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(100).select(
        F.col("id"), F.current_timestamp().alias("ts")
    )
    df.write.parquet(src)
    q = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    prog = query_progress(q)
    assert prog["batch_id"] is not None
    assert prog["input_rows"] == 100
    assert not lag_alert(prog)  # a 100-row batch is under 60 s
    assert lag_alert({"batch_duration_ms": 120_000})

"""Tests for the scale toolbox: partitioned writes (pruning), salted
joins (skew), stream monitoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.joins import equi_join, salted_join
from lakehouse_cdc_spark.plans.registry import table
from lakehouse_cdc_spark.sources import read_partitioned, write_time_partitioned
from lakehouse_cdc_spark.streaming import cdc_pipeline  # noqa: F401  (import check)
from lakehouse_cdc_spark.streaming.monitor import lag_alert, query_progress


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """The co-located-join contract: two tables bucketed identically
    on the join key join with NO shuffle exchange — the write-time
    clustering satisfies the join's distribution requirement.  This is
    the amortize-one-shuffle-over-many-queries layout for 100 TB."""
    from lakehouse_cdc_spark.catalog import drop_table, write_bucketed

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    try:
        write_bucketed(o, "orders_b", ["o_custkey"], n_buckets=8)
        write_bucketed(c, "customer_b", ["c_custkey"], n_buckets=8)
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("customer_b").hint("shuffle_merge"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself introduces no exchange: both scans are
        # bucketed on the key (only the final 5-row groupBy shuffles)
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in join_part
        assert joined.count() == 5
        # equivalent unbucketed join shuffles BOTH sides
        plain = o.join(
            c.hint("shuffle_merge"), F.col("o_custkey") == F.col("c_custkey")
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange hashpartitioning") >= 2
    finally:
        drop_table(spark, "orders_b")
        drop_table(spark, "customer_b")


def test_csv_jsonl_roundtrip_events(spark, sf_dir, tmp_path):
    """CSV and JSON-lines round-trip the events table bit-for-bit
    under explicit schemas + pinned timestamp format — no inference
    pass, no parser-default drift."""
    from lakehouse_cdc_spark.sources import (
        read_csv,
        read_jsonl,
        write_csv,
        write_jsonl,
    )

    e = table(spark, sf_dir, "events")
    ref = {tuple(r) for r in e.collect()}
    for writer, reader, sub in (
        (write_csv, read_csv, "csv"),
        (write_jsonl, read_jsonl, "jsonl"),
    ):
        p = str(tmp_path / sub)
        writer(e, p)
        back = reader(spark, p, e.schema)
        assert back.schema == e.schema, sub
        assert {tuple(r) for r in back.collect()} == ref, sub


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
    assert q.awaitTermination(300), "stream did not finish in 300s"
    prog = query_progress(q)
    assert prog["batch_id"] is not None
    assert prog["input_rows"] == 100
    assert not lag_alert(prog)  # a 100-row batch is under 60 s
    assert lag_alert({"batch_duration_ms": 120_000})


def test_orc_roundtrip_preserves_events(spark, sf_dir, tmp_path):
    """ORC write/read must round-trip the events table byte-exactly
    (including the rebuilt microsecond timestamps) and push filters
    down to the scan."""
    from pyspark.sql import functions as F

    from lakehouse_cdc_spark.plans.registry import table
    from lakehouse_cdc_spark.sources.formats import read_orc, write_orc

    ev = table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    write_orc(ev, path)
    back = read_orc(spark, path)
    assert back.schema == ev.schema
    a = {tuple(r) for r in ev.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    plan = (
        back.filter(F.col("user_id") == 7)
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in plan


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """A selective dim filter joined on the partition column must
    inject a dynamic pruning subquery into the fact scan (Spark's DPP
    — the runtime analog of the static pruning
    test_write_time_partitioned_prunes covers)."""
    from pyspark.sql import functions as F

    from lakehouse_cdc_spark.plans.registry import table

    path = str(tmp_path / "events_by_type")
    table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("view", 2), ("click", 3)], "event_type string, w int"
    ).filter(F.col("w") == 1)
    joined = fact.join(dim, "event_type").select("event_id", "w")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan or "dynamicpruningexpression" in plan.lower()
    # and the pruned read really only touches one partition's rows
    expected = fact.filter(F.col("event_type") == "purchase").count()
    assert joined.count() == expected


def test_csv_malformed_row_handling_modes(spark, tmp_path):
    """Ingestion robustness: PERMISSIVE captures the corrupt line in
    the designated column, DROPMALFORMED silently drops it, FAILFAST
    raises — the three contract modes a production CSV loader needs."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    path = tmp_path / "dirty.csv"
    path.write_text("1,alice,10.5\n2,bob,not_a_number\n3,carol,7.25\n")
    schema = "id long, name string, score double"

    permissive = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(path))
        .cache()
    )
    assert permissive.count() == 3
    bad = permissive.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and bad[0].id == 2 and bad[0].score is None
    assert "not_a_number" in bad[0]._corrupt_record

    dropped = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .csv(str(path))
        .collect()
    )
    assert {r.id for r in dropped} == {1, 3}

    with _pytest.raises((Py4JJavaError, Exception)):
        spark.read.schema(schema).option("mode", "FAILFAST").csv(
            str(path)
        ).collect()

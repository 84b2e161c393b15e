"""DDL / catalog lifecycle tests (SURVEY S13–S17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.catalog import (
    create_namespace,
    create_table_if_not_exists,
    drop_table,
    show_namespaces,
    table_exists,
)


def test_table_lifecycle(spark):
    name = "t_lifecycle"
    drop_table(spark, name)
    assert not table_exists(spark, name)

    like = spark.range(5).withColumn("grp", F.col("id") % 2)
    create_table_if_not_exists(spark, name, like, partition_by=["grp"])
    assert table_exists(spark, name)
    assert spark.table(name).count() == 0  # created empty
    assert spark.table(name).columns == ["id", "grp"]

    # idempotent: second create is a no-op even with different schema
    create_table_if_not_exists(spark, name, spark.range(3))
    assert spark.table(name).columns == ["id", "grp"]

    # v1 session-catalog tables append via the v1 writer
    like.write.insertInto(name)
    assert spark.table(name).count() == 5

    drop_table(spark, name)
    assert not table_exists(spark, name)


def test_namespace_and_show(spark):
    create_namespace(spark, "ns_test")
    assert "ns_test" in show_namespaces(spark)


def test_insert_into_values_sink(spark):
    """S11: INSERT INTO ... VALUES with CURRENT_TIMESTAMP(), the
    offset-ledger append pattern (spark_exactly_once.py:326-334)."""
    drop_table(spark, "offsets_ledger")
    spark.sql(
        "CREATE TABLE offsets_ledger "
        "(commit_time timestamp, topic string, partition int, offset int) "
        "USING parquet"
    )
    spark.sql(
        "INSERT INTO offsets_ledger VALUES "
        "(CURRENT_TIMESTAMP(), 'items', 0, 42), "
        "(CURRENT_TIMESTAMP(), 'items', 1, 7)"
    )
    rows = spark.table("offsets_ledger").orderBy("partition").collect()
    assert [(r.topic, r.partition, r.offset) for r in rows] == [
        ("items", 0, 42),
        ("items", 1, 7),
    ]
    assert all(r.commit_time is not None for r in rows)
    drop_table(spark, "offsets_ledger")

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


def test_jdbc_source_options_contract():
    """S8 hardening: the parallel-scan option dict is pinned so the
    only untested surface is the DB handshake itself (no database in
    this environment)."""
    from lakehouse_cdc_spark.catalog import jdbc_source_options

    opts = jdbc_source_options(
        "jdbc:postgresql://db:5432/app",
        "public.users",
        user="u",
        password="p",
        partition_column="id",
        num_partitions=16,
        lower_bound=0,
        upper_bound=500_000,
    )
    assert opts == {
        "url": "jdbc:postgresql://db:5432/app",
        "dbtable": "public.users",
        "fetchsize": "10000",
        "user": "u",
        "password": "p",
        "partitionColumn": "id",
        "numPartitions": "16",
        "lowerBound": "0",
        "upperBound": "500000",
    }
    # unbounded variant: no partition options leak in
    plain = jdbc_source_options("jdbc:postgresql://db/app", "t")
    assert "partitionColumn" not in plain and "user" not in plain

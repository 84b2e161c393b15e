"""Catalog / DDL operators (SURVEY §2.1 S13–S17).

The reference manages its lakehouse tables with SQL DDL through the
Iceberg catalog (CREATE NAMESPACE/TABLE, ALTER TBLPROPERTIES, DROP
PURGE, SHOW NAMESPACES — spark_batch.py:52-99,444, delete_table.py:121-124).
These wrappers express the same lifecycle against whatever catalog the
session has (in-memory/hive for tests, Iceberg REST in production);
table writes go through ``DataFrameWriterV2``/``saveAsTable`` so the
code path is catalog-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_namespace(spark: SparkSession, name: str) -> None:
    """S14 (spark_batch.py:444)."""
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {name}")


def table_exists(spark: SparkSession, name: str) -> bool:
    """The reference probes existence with ``SELECT 1 ... LIMIT 1``
    (S13, spark_batch.py:60); the catalog API answers without a scan."""
    return spark.catalog.tableExists(name)


def create_table_if_not_exists(
    spark: SparkSession,
    name: str,
    like: DataFrame,
    partition_by: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """S13+S15: create an empty managed table with ``like``'s schema,
    optional partitioning and table properties (the reference sets
    parquet + snappy, spark_batch.py:91-96 — our session default)."""
    if table_exists(spark, name):
        return
    writer = like.limit(0).writeTo(name).using("parquet")
    for col in partition_by or []:
        writer = writer.partitionedBy(col)
    for k, v in (properties or {}).items():
        writer = writer.tableProperty(k, v)
    writer.create()


def drop_table(spark: SparkSession, name: str, purge: bool = True) -> None:
    """S16 (delete_table.py:124)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}" + (" PURGE" if purge else ""))


def show_namespaces(spark: SparkSession) -> list[str]:
    """S17 smoke probe (spark_session.py:191)."""
    return [r[0] for r in spark.sql("SHOW NAMESPACES").collect()]


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S8: the OLTP-side scan the validation toolkit does with psycopg2
    (validation.py:221-227) as a parallel JDBC read.  Config-only here
    (no database in the test environment); ``partition_column`` bounds
    split the scan across executors instead of one driver cursor."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_source_options(
        url,
        table,
        user=user,
        password=password,
        partition_column=partition_column,
        num_partitions=num_partitions,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_source_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> dict[str, str]:
    """The exact option dict :func:`jdbc_source` applies — exposed
    separately (like ``kafka_source_options``) so the untested surface
    is only the database handshake itself, not the option plumbing."""
    opts = {"url": url, "dbtable": table, "fetchsize": "10000"}
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound or 0),
            upperBound=str(upper_bound or 1_000_000),
        )
    return opts


def write_bucketed(
    df,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a BUCKETED session-catalog table (Hive-style
    ``bucketBy``): rows are hash-clustered into ``n_buckets`` files by
    ``bucket_cols`` at write time.

    This is the co-located-join primitive at 100 TB: two tables
    bucketed the same way join with ZERO shuffle exchanges — the scan
    itself satisfies the join's partitioning requirement (verified by
    plan assertion in tests/test_scale_tools.py).  Aggregations on the
    bucket key skip their exchange the same way.  The written table is
    also the right layout for repeated joins: one write-time shuffle
    amortized over every subsequent query.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)

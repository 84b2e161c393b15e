"""Streaming sources (SURVEY S1/S2/T1).

``kafka_cdc_source`` is the production path (requires the Kafka
connector jar + a broker — neither exists in the test container, so it
is config-only here, mirroring the reference's connection surface).
``file_cdc_source`` is the test-harness equivalent: a parquet-file
stream with ``maxFilesPerTrigger`` standing in for the reference's
100-records-per-micro-batch flush (spark_batch.py:324).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def kafka_cdc_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka change-stream source.

    Replaces the driver-side ``Consumer(kafka_config).subscribe``
    poll loop (spark_batch.py:25-29,310-311).  Offset tracking,
    at-least-once delivery and restart recovery come from the
    checkpoint — the reference's manual ``assign(offset+1)`` seek
    (spark_exactly_once.py:579-588) is obsolete.  ``read_committed``
    isolation mirrors spark_exactly_once.py:29.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.isolation.level", "read_committed")
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def file_cdc_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Parquet-directory stream for tests: each file becomes (part of)
    a micro-batch — deterministic replay of a change log without a
    broker."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source — load-generator stand-in (the reference
    uses Locust, src/locust/locustfile.py)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )

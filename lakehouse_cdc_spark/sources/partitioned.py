"""Time-partitioned parquet layout (SURVEY §1.3).

The reference partitions its target table by (year, month) strings it
computes *in driver Python at processing time*
(``spark_batch.py:84,232-233``) — so the partition values describe
when the row was processed, not the data, and the derivation is a
per-record Python call.

Here the partition columns are derived columnar from an event-time
column (``date_format``), written with dynamic partition overwrite.
Queries that filter on the derived columns prune partitions at the
directory level; at 100 TB with Iceberg the same intent becomes hidden
partitioning (``months(ts)``) so pruning works on the raw timestamp
predicate without exposing derived columns at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` partitioned by year/month derived from ``ts_col``."""
    (
        df.withColumn("year", F.date_format(F.col(ts_col), "yyyy"))
        .withColumn("month", F.date_format(F.col(ts_col), "MM"))
        .write.mode(mode)
        .partitionBy("year", "month")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; filters on year/month prune at the
    directory level (verify: PartitionFilters in .explain)."""
    return spark.read.parquet(path)

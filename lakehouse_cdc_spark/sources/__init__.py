"""Batch table I/O: partitioned lakehouse writes.

(Streaming sources live in ``lakehouse_cdc_spark.streaming.sources``;
catalog/DDL in ``lakehouse_cdc_spark.catalog``.)
"""

from lakehouse_cdc_spark.sources.partitioned import (
    write_time_partitioned,
    read_partitioned,
)
from lakehouse_cdc_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

__all__ = [
    "write_time_partitioned",
    "read_partitioned",
    "read_csv",
    "write_csv",
    "read_jsonl",
    "write_jsonl",
]

"""Multi-format batch I/O: CSV / JSON-lines readers and writers with
explicit schemas.

The reference reads only Kafka/Iceberg/JDBC; a general engine also
ingests flat files.  Two rules make these scale-safe:

- ALWAYS pass an explicit schema.  Schema inference is a full extra
  pass over the data (at 100 TB, a second 100 TB scan) and can
  mis-type sparse columns; with a schema the read is single-pass and
  the plan's ReadSchema is fixed.
- Timestamps round-trip as ISO-8601 strings with explicit
  ``timestampFormat`` — CSV/JSON have no native timestamp type, so
  leaving the format implicit ties the data to one Spark version's
  parser defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("timestampFormat", TS_FMT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema).option("timestampFormat", TS_FMT).json(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC with zlib — the columnar interchange format Hive-era
    warehouses emit; schema travels in the file footer like parquet."""
    df.write.mode(mode).option("compression", "zlib").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; predicate pushdown and column pruning work as for
    parquet (verify via PushedFilters/ReadSchema in .explain)."""
    return spark.read.orc(path)

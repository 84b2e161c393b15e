"""CDC operation classifier (SURVEY S4).

The reference classifies per-record in Python
(``src/processor/spark_batch.py:101-116``): ``__deleted=='true'`` →
``'d'``; ``id is None`` → ``'c'``; else ``'u'``.  Columnar equivalent:
one ``when`` chain, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_cdc_spark.cdc.decode import deleted_flag


def classify_operation(
    df: DataFrame,
    key_col: str = "id",
    deleted_col: str = "__deleted",
    out_col: str = "operation",
) -> DataFrame:
    """Add ``operation ∈ {c,u,d}`` (spark_batch.py:101-116 semantics)."""
    op = (
        F.when(deleted_flag(deleted_col), F.lit("d"))
        .when(F.col(key_col).isNull(), F.lit("c"))
        .otherwise(F.lit("u"))
    )
    return df.withColumn(out_col, op)

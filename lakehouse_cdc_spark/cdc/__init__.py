"""CDC semantics, Spark-first.

The reference's pipeline is: Debezium-envelope decode → operation
classification → in-batch last-write-wins dedup → MERGE upsert
(``src/processor/spark_batch.py:192-302``).  Here each stage is a
declarative DataFrame transform (columnar, distributed) instead of a
driver-side Python loop, and the upsert has two interchangeable
implementations: a pure-DataFrame ``apply_changes`` (ANSI-expressible,
oracle-checkable) and an Iceberg ``MERGE INTO`` writer used when the
Iceberg runtime is present.
"""

from lakehouse_cdc_spark.cdc.decode import DEBEZIUM_ITEM_SCHEMA, decode_debezium
from lakehouse_cdc_spark.cdc.classify import classify_operation
from lakehouse_cdc_spark.cdc.apply import apply_changes, compact_changes

__all__ = [
    "DEBEZIUM_ITEM_SCHEMA",
    "decode_debezium",
    "classify_operation",
    "compact_changes",
    "apply_changes",
]

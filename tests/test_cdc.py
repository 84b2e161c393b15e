"""Unit tests for the CDC operator family — hand-built change batches
exercising every MERGE arm and the reference's edge cases
(FIXTURES.md §1.2/§1.5)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lakehouse_cdc_spark.cdc import (
    apply_changes,
    classify_operation,
    compact_changes,
    decode_debezium,
)
from lakehouse_cdc_spark.cdc.apply import merge_into_sql


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_decode_skips_poison_messages(spark):
    raw = spark.createDataFrame(
        [
            ('{"payload": {"id": 1, "name": "a", "description": "d", '
             '"price": 10, "on_offer": true, "__deleted": "false"}}',),
            (None,),
            ("",),
            ("   ",),
            ("empty",),
            ("{not json",),
            ('{"other": 1}',),
            ('{"payload": {"id": 2, "name": "b", "description": null, '
             '"price": 20, "on_offer": false, "__deleted": "true"}}',),
        ],
        "value string",
    )
    rows = decode_debezium(raw).orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2]
    assert rows[0].name == "a" and rows[0].price == 10
    assert rows[1]["__deleted"] == "true"


def test_classify_operation_c_u_d(spark):
    df = spark.createDataFrame(
        [
            (1, "false"),
            (None, "false"),  # null id → create
            (2, "true"),  # deleted → delete
            (3, None),  # missing flag → update
            (4, "TRUE"),  # case-insensitive → delete (spark_batch.py:107)
        ],
        "id int, __deleted string",
    )
    got = {
        (r.id, r.operation)
        for r in classify_operation(df).collect()
    }
    assert got == {(1, "u"), (None, "c"), (2, "d"), (3, "u"), (4, "d")}


def test_compact_changes_last_write_wins_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), 100, "a"),
            (1, ts("2024-01-01T11:00:00"), 101, "b"),  # newest ts wins
            (2, ts("2024-01-01T10:00:00"), 200, "x"),
            (2, ts("2024-01-01T10:00:00"), 201, "y"),  # ts tie → higher seq wins
        ],
        "id int, t timestamp, seq int, v string",
    )
    rows = compact_changes(df, keys=["id"], order_by=["t", "seq"]).orderBy("id").collect()
    assert [(r.id, r.v) for r in rows] == [(1, "b"), (2, "y")]


def test_apply_changes_all_merge_arms(spark):
    base = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "id int, v string"
    )
    changes = spark.createDataFrame(
        [
            # matched update (two versions; newest wins)
            (1, "new1-early", "u", ts("2024-01-01T10:00:00"), 1),
            (1, "new1", "u", ts("2024-01-01T11:00:00"), 2),
            # matched delete
            (2, "whatever", "d", ts("2024-01-01T10:00:00"), 3),
            # unmatched insert
            (4, "new4", "c", ts("2024-01-01T10:00:00"), 4),
            # unmatched delete → must NOT insert (reference bug, fixed:
            # spark_batch.py:277-279 would insert this ghost row)
            (5, "ghost", "d", ts("2024-01-01T10:00:00"), 5),
        ],
        "id int, v string, operation string, t timestamp, seq int",
    )
    result = apply_changes(base, changes, keys=["id"], order_by=["t", "seq"])
    got = {(r.id, r.v) for r in result.collect()}
    assert got == {(1, "new1"), (3, "old3"), (4, "new4")}


def test_apply_changes_delete_then_recreate_within_batch(spark):
    base = spark.createDataFrame([(1, "old")], "id int, v string")
    changes = spark.createDataFrame(
        [
            (1, None, "d", ts("2024-01-01T10:00:00"), 1),
            (1, "recreated", "c", ts("2024-01-01T11:00:00"), 2),
        ],
        "id int, v string, operation string, t timestamp, seq int",
    )
    result = apply_changes(base, changes, keys=["id"], order_by=["t", "seq"])
    assert [(r.id, r.v) for r in result.collect()] == [(1, "recreated")]


def test_merge_into_sql_shape():
    sql = merge_into_sql("iceberg.db.items", "source_data", ["id"],
                         ["name", "price"])
    assert "WHEN MATCHED AND source.operation = 'd' THEN DELETE" in sql
    assert "source.operation != 'd'" in sql  # guarded insert arm
    assert "WHEN NOT MATCHED AND source.operation IS NOT NULL" in sql
    assert "target.id = source.id" in sql


def test_apply_changes_is_idempotent(spark):
    """Replaying the same compacted batch must be a no-op — the
    property the exactly-once path's batch ledger protects
    (spark_exactly_once.py:292-341); here it holds algebraically."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    changes = spark.createDataFrame(
        [(1, "a2", "u", ts("2024-01-01T10:00:00"), 1),
         (3, "c", "c", ts("2024-01-01T10:00:00"), 2)],
        "id int, v string, operation string, t timestamp, seq int",
    )
    once = apply_changes(base, changes, keys=["id"], order_by=["t", "seq"])
    twice = apply_changes(once, changes, keys=["id"], order_by=["t", "seq"])
    assert sorted((r.id, r.v) for r in once.collect()) == sorted(
        (r.id, r.v) for r in twice.collect()
    )


def test_decode_tolerates_schema_drift(spark):
    """Unknown payload fields (upstream added a column) are ignored;
    missing fields decode as NULL — the from_json permissive contract
    the CDC pipeline's schema evolution relies on."""
    raw = spark.createDataFrame(
        [
            # extra field never seen in the schema
            ('{"payload": {"id": 1, "name": "a", "description": "d", '
             '"price": 10, "on_offer": true, "__deleted": "false", '
             '"brand_new_column": "surprise"}}',),
            # missing most fields
            ('{"payload": {"id": 2}}',),
        ],
        "value string",
    )
    rows = decode_debezium(raw).orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2]
    assert rows[0].name == "a"
    assert "brand_new_column" not in rows[0].asDict()
    assert rows[1].name is None and rows[1].price is None


def test_snapshot_diff_replay_reproduces_after(spark):
    """diff(before, after) replayed through apply_changes(before)
    must reproduce `after` exactly — the CDF round-trip property."""
    from lakehouse_cdc_spark.cdc.diff import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (6, None, 60.0)],
        "id int, v string, x double",
    )
    after = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", None), (6, None, 60.0)],
        "id int, v string, x double",
    )
    diff = snapshot_diff(before, after, keys=["id"])
    got = {(r.id, r.v, r.x, r._change_type) for r in diff.collect()}
    assert got == {
        (2, "B", 20.0, "update"),
        (3, "c", 30.0, "delete"),
        (4, "d", None, "insert"),
    }  # unchanged keys 1 and 6 (with NULL value col) emit no row

    changes = diff.withColumn(
        "operation",
        F.when(F.col("_change_type") == "delete", "d").otherwise("u"),
    ).withColumn("seq", F.lit(1))
    replayed = apply_changes(
        before, changes.drop("_change_type"), keys=["id"], order_by=["seq"]
    )
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in after.collect()
    }


def test_snapshot_diff_rejects_schema_mismatch(spark):
    from lakehouse_cdc_spark.cdc.diff import snapshot_diff

    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(1,)], "id int")
    try:
        snapshot_diff(a, b, keys=["id"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_decode_dlq_accounts_for_every_dropped_message(spark):
    """good + dlq must partition the input exactly, with the right
    reason tag per drop class."""
    from lakehouse_cdc_spark.cdc.decode import (
        decode_debezium,
        decode_debezium_with_dlq,
    )

    rows = [
        ('{"payload": {"id": 1, "name": "a", "description": "d", '
         '"price": 10, "on_offer": true, "__deleted": "false"}}',),
        (None,),
        ("   ",),
        ("empty",),
        ("{not json at all",),
        ('{"other": 1}',),  # parseable but no payload
        ('{"payload": {"id": 2, "name": "b", "description": "e", '
         '"price": 20, "on_offer": false, "__deleted": "true"}}',),
    ]
    raw = spark.createDataFrame(rows, "value string")
    good, dlq = decode_debezium_with_dlq(raw)
    assert {r.id for r in good.collect()} == {1, 2}
    reasons = sorted(r.reason for r in dlq.collect())
    assert reasons == [
        "null_or_empty",
        "null_or_empty",
        "sentinel_empty",
        "unparseable",
        "unparseable",
    ]
    assert good.count() + dlq.count() == len(rows)
    # and the plain decoder keeps exactly the good half
    assert decode_debezium(raw).count() == good.count()

"""Regression tests for the issues found in the round-1 code review:
salted-join outer guard, null-key base rows, merge SQL null-op arms,
orphan-file crash recovery, fresh-checkpoint lineage guard."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_cdc_spark.cdc.apply import apply_changes, merge_into_sql
from lakehouse_cdc_spark.maintenance import remove_orphan_files
from lakehouse_cdc_spark.operators.joins import salted_join
from lakehouse_cdc_spark.streaming import SnapshotUpsertSink


def test_salted_join_rejects_outer_joins(spark):
    l = spark.createDataFrame([(1, "a")], "k int, v string")
    r = spark.createDataFrame([(1, "d")], "k int, name string")
    for how in ("full", "right", "full_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(l, r, "k", how=how)


def test_apply_changes_preserves_null_key_base_rows(spark):
    base = spark.createDataFrame([(1, "a"), (None, "nullkey")], "id int, v string")
    changes = spark.createDataFrame(
        [(2, "b", "u", datetime.datetime(2024, 1, 1), 1)],
        "id int, v string, operation string, t timestamp, seq int",
    )
    got = {
        (r.id, r.v)
        for r in apply_changes(base, changes, keys=["id"], order_by=["t", "seq"]).collect()
    }
    assert got == {(1, "a"), (None, "nullkey"), (2, "b")}


def test_apply_changes_ignores_null_operation(spark):
    base = spark.createDataFrame([(1, "a")], "id int, v string")
    changes = spark.createDataFrame(
        [(1, "overwrite?", None, datetime.datetime(2024, 1, 1), 1),
         (2, "ghost?", None, datetime.datetime(2024, 1, 1), 2)],
        "id int, v string, operation string, t timestamp, seq int",
    )
    got = {
        (r.id, r.v)
        for r in apply_changes(base, changes, keys=["id"], order_by=["t", "seq"]).collect()
    }
    assert got == {(1, "a")}  # null-op rows are no-ops, nothing inserted


def test_merge_sql_null_op_arms_match_apply_changes():
    sql = merge_into_sql("t", "s", ["id"], ["v"])
    assert "WHEN MATCHED AND source.operation IS NOT NULL" in sql
    # no unconditional WHEN MATCHED THEN UPDATE remains
    assert "WHEN MATCHED THEN UPDATE" not in sql


def test_null_op_does_not_mask_earlier_valid_change(spark):
    """A newest-per-key row with NULL operation must not swallow an
    earlier valid change in the same batch: NULL-op rows are excluded
    BEFORE compaction."""
    base = spark.createDataFrame([(1, "old")], "id int, v string")
    changes = spark.createDataFrame(
        [
            (1, "updated", "u", datetime.datetime(2024, 1, 1, 10), 1),
            (1, "garbage", None, datetime.datetime(2024, 1, 1, 11), 2),  # newest!
        ],
        "id int, v string, operation string, t timestamp, seq int",
    )
    got = apply_changes(base, changes, keys=["id"], order_by=["t", "seq"]).collect()
    assert [(r.id, r.v) for r in got] == [(1, "updated")]


def test_cross_lineage_replay_same_batch_id_no_path_collision(spark, tmp_path):
    """Lineage A commits only batch 0; lineage B replays batch 0.
    The sink must read the committed snapshot and write a NEW one —
    reading and overwriting the same path in one job is a Spark
    error."""
    target = str(tmp_path / "t")
    mk = lambda v, seq: spark.createDataFrame(  # noqa: E731
        [(1, v, "u", seq)], "id int, v string, operation string, seq int"
    )
    a = SnapshotUpsertSink(target, keys=["id"], order_by=["seq"], lineage="A")
    a.process_batch(mk("a0", 1), 0)
    assert a.committed_snapshot() == 0

    b = SnapshotUpsertSink(target, keys=["id"], order_by=["seq"], lineage="B")
    b.process_batch(mk("b0", 2), 0)  # same batch id as committed
    assert b.committed_snapshot() == 1  # fresh snapshot dir
    assert b.current_table(spark).collect()[0].v == "b0"


def test_expire_parses_lineage_stamped_pointer(spark, tmp_path):
    """expire_snapshots must keep the committed snapshot even when the
    pointer carries a lineage prefix (and even when stale higher-
    numbered snapshots from an older lineage exist)."""
    from lakehouse_cdc_spark.maintenance import expire_snapshots

    target = str(tmp_path / "t")
    mk = lambda v, seq: spark.createDataFrame(  # noqa: E731
        [(1, v, "u", seq)], "id int, v string, operation string, seq int"
    )
    a = SnapshotUpsertSink(target, keys=["id"], order_by=["seq"], lineage="ckA")
    for i in range(6):
        a.process_batch(mk(f"a{i}", i), i)
    assert a.committed_snapshot() == 5
    expired = expire_snapshots(target, retain_last=2)
    assert 5 not in expired  # committed survives
    assert a.current_table(spark).collect()[0].v == "a5"


def test_remove_orphans_restores_backup_when_table_missing(tmp_path):
    d = tmp_path / "wh"
    d.mkdir()
    # crash state: only the .old backup exists
    (d / "tbl.old").mkdir()
    (d / "tbl.old" / "part-0.parquet").write_text("data")
    actions = remove_orphan_files(str(d))
    assert actions == ["tbl.old -> restored"]
    assert (d / "tbl" / "part-0.parquet").exists()
    # normal state: table exists → backup is debris, deleted
    (d / "tbl.old").mkdir()
    actions = remove_orphan_files(str(d))
    assert actions == ["tbl.old"]
    assert not (d / "tbl.old").exists()


def test_fresh_checkpoint_lineage_reprocesses(spark, tmp_path):
    """Same target, new checkpoint lineage, batch ids restart at 0:
    the sink must process (not silently skip) the new batches."""
    target = str(tmp_path / "t")
    mk = lambda v, seq: spark.createDataFrame(  # noqa: E731
        [(1, v, "u", seq)], "id int, v string, operation string, seq int"
    )
    old = SnapshotUpsertSink(target, keys=["id"], order_by=["seq"], lineage="ckpt-A")
    for b in range(3):
        old.process_batch(mk(f"a{b}", b), b)
    assert old.current_table(spark).collect()[0].v == "a2"

    # operator deletes the checkpoint → new lineage, batch ids from 0
    new = SnapshotUpsertSink(target, keys=["id"], order_by=["seq"], lineage="ckpt-B")
    new.process_batch(mk("b0", 10), 0)  # would be skipped pre-fix (0 <= 2)
    assert new.current_table(spark).collect()[0].v == "b0"
    # and within the new lineage, replay is still idempotent
    new.process_batch(mk("b0-replay", 11), 0)
    assert new.current_table(spark).collect()[0].v == "b0"

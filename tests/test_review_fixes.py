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


def test_claim_retake_requires_matching_batch(spark, tmp_path):
    """Review finding: a gc/compact call (batch_id=None) on the same
    sink object must NOT silently retake a live stream batch's claim
    just because the lineage matches."""
    import pytest

    from lakehouse_cdc_spark.streaming.pipeline import (
        ConcurrentCommitError,
        SnapshotUpsertSink,
    )

    s = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], lineage="L"
    )
    s._claim(0, batch_id=7)  # stream batch holds the fence
    with pytest.raises(ConcurrentCommitError):
        s._claim(0, batch_id=None)  # maintenance must not alias it
    # the true crash-replay (same lineage AND batch) still retakes
    s._claim(0, batch_id=7)
    import os

    os.unlink(s._claim_path(0))


def test_lineage_none_writer_can_retake_own_claim(spark, tmp_path):
    """Review finding: a standalone sink (lineage=None) whose write
    failed transiently must be able to retry — the empty-lineage owner
    check used to reject its own claim forever."""
    from lakehouse_cdc_spark.streaming.pipeline import SnapshotUpsertSink

    s = SnapshotUpsertSink(str(tmp_path / "t"), keys=["id"], order_by=["seq"])
    s._claim(0, batch_id=3)
    s._claim(0, batch_id=3)  # same writer retrying: must not raise
    import os

    os.unlink(s._claim_path(0))


def test_gc_watermark_datetime_is_json_safe(spark, tmp_path):
    """Review finding: an event-time (datetime) GC watermark crashed
    json.dump AFTER data was written; it must round-trip via ISO
    string and still filter late data."""
    import datetime

    from lakehouse_cdc_spark.streaming.pipeline import SnapshotUpsertSink

    s = SnapshotUpsertSink(str(tmp_path / "t"), keys=["id"], order_by=["ts"])
    ts = datetime.datetime.fromisoformat
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-10T00:00:00"), "u"),
            (2, ts("2024-03-01T00:00:00"), "d"),
        ],
        "id int, ts timestamp, operation string",
    )
    s.process_batch(df, 0)
    s.gc_tombstones(spark, ts("2024-02-01T00:00:00"))
    wm = s._read_manifest(s.committed_snapshot()).get("gc_watermark")
    assert isinstance(wm, str) and wm.startswith("2024-02-01")
    # late-data floor still applies: a pre-watermark change is dropped
    late = spark.createDataFrame(
        [(3, ts("2024-01-05T00:00:00"), "u")],
        "id int, ts timestamp, operation string",
    )
    s.process_batch(late, 2)
    assert 3 not in {r.id for r in s.current_table(spark).collect()}


def test_state_at_rejects_uncommitted_snapshot_dir(spark, tmp_path):
    """Review finding: a bare v=N dir from a crashed writer (no
    manifest) must raise, not silently serve partial state."""
    import os

    import pytest

    from lakehouse_cdc_spark.streaming.pipeline import SnapshotUpsertSink

    s = SnapshotUpsertSink(str(tmp_path / "t"), keys=["id"], order_by=["seq"])
    df = spark.createDataFrame(
        [(1, 1, "u")], "id int, seq int, operation string"
    )
    s.process_batch(df, 0)  # committed v=0 with manifest
    # crashed attempt: data dir exists, no manifest
    orphan = s._snapshot_path(1)
    os.makedirs(os.path.join(orphan, "__bucket=0"))
    with pytest.raises(ValueError, match="never committed"):
        s.state_at(spark, 1)


def test_rollback_drops_later_manifests_and_claims(spark, tmp_path):
    """Review finding: rollback_to left later manifests + claims in
    place, so recover_interrupted_commit could re-roll the rolled-back
    snapshot forward (and stale claims wedged fresh writers)."""
    import os

    from lakehouse_cdc_spark.streaming.pipeline import SnapshotUpsertSink

    s = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], lineage="L"
    )
    mk = lambda seq: spark.createDataFrame(
        [(1, "x", seq, "u")], "id int, name string, seq int, operation string"
    )
    s.process_batch(mk(1), 0)
    s.process_batch(mk(2), 1)
    # simulate a stale claim left beyond the rollback target
    open(s._claim_path(2), "w").write("L:5")
    s.rollback_to(0)
    assert s.committed_snapshot() == 0
    assert not os.path.exists(s._manifest_path(1))
    assert not os.path.exists(s._claim_path(2))
    assert s.recover_interrupted_commit() is None  # nothing to re-roll
    state = {r.seq for r in s.current_table(spark).collect()}
    assert state == {1}


def test_gc_watermark_datetime_is_periodic_safe(spark, tmp_path):
    """Advice finding: the SECOND gc_tombstones call with a datetime
    watermark crashed — prev round-trips from the manifest as an ISO
    string and `datetime < str` raises TypeError.  Periodic event-time
    GC must work; non-monotone watermarks must raise ValueError (the
    contract), never TypeError."""
    import datetime

    import pytest

    from lakehouse_cdc_spark.streaming.pipeline import SnapshotUpsertSink

    s = SnapshotUpsertSink(str(tmp_path / "t"), keys=["id"], order_by=["ts"])
    ts = datetime.datetime.fromisoformat
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-10T00:00:00"), "u"),
            (2, ts("2024-01-20T00:00:00"), "d"),
            (3, ts("2024-02-20T00:00:00"), "d"),
        ],
        "id int, ts timestamp, operation string",
    )
    s.process_batch(df, 0)
    assert s.gc_tombstones(spark, ts("2024-02-01T00:00:00")) == 1
    # the periodic follow-up call — crashed with TypeError pre-fix
    assert s.gc_tombstones(spark, ts("2024-03-01T00:00:00")) == 1
    wm = s._read_manifest(s.committed_snapshot()).get("gc_watermark")
    assert isinstance(wm, str) and wm.startswith("2024-03-01")
    # regression guard on the monotone check's exception type
    with pytest.raises(ValueError, match="monotone"):
        s.gc_tombstones(spark, ts("2024-01-01T00:00:00"))


def test_current_state_rejects_manifestless_snapshot(spark, tmp_path):
    """Advice finding: state_at refuses a bare v=N dir on a
    manifest-era target but current_state still served it — a pointer
    moved onto a crashed writer's uncommitted snapshot exposed partial
    never-committed state."""
    import os

    import pytest

    from lakehouse_cdc_spark.streaming.pipeline import SnapshotUpsertSink

    s = SnapshotUpsertSink(str(tmp_path / "t"), keys=["id"], order_by=["seq"])
    df = spark.createDataFrame([(1, 1, "u")], "id int, seq int, operation string")
    s.process_batch(df, 0)  # committed v=0 with manifest
    # crashed writer: bare v=1 data, no manifest; pointer forced onto it
    os.makedirs(os.path.join(s._snapshot_path(1), "__bucket=0"))
    s._publish_pointer(None, 1, 1)
    with pytest.raises(ValueError, match="no manifest"):
        s.current_state(spark)


def test_rollback_to_refuses_uncommitted_snapshot(spark, tmp_path):
    """Advice finding: rollback_to accepted a manifest-less v=N dir on
    a manifest-era target, wedging current_state onto partial state."""
    import os

    import pytest

    from lakehouse_cdc_spark.streaming.pipeline import SnapshotUpsertSink

    s = SnapshotUpsertSink(str(tmp_path / "t"), keys=["id"], order_by=["seq"])
    df = spark.createDataFrame([(1, 1, "u")], "id int, seq int, operation string")
    s.process_batch(df, 0)
    os.makedirs(os.path.join(s._snapshot_path(1), "__bucket=0"))
    with pytest.raises(ValueError, match="not a committed snapshot"):
        s.rollback_to(1)


def test_cdclog_contradictory_part_predicates_return_empty(spark):
    """Advice finding: pushFilters consumed every EqualTo on `part`
    keeping only the LAST value, so `part = 1 AND part = 2` returned
    part=2's rows instead of the correct empty set (the consumed
    filters are never re-evaluated by Spark)."""
    from lakehouse_cdc_spark.sources.cdclog import register_cdclog

    register_cdclog(spark)
    df = (
        spark.read.format("cdclog")
        .options(n="40", parts="4", keys="10")
        .load()
    )
    from pyspark.sql import functions as F

    assert df.filter((F.col("part") == 1) & (F.col("part") == 2)).count() == 0
    # sanity: a single consistent equality still prunes correctly
    assert df.filter(F.col("part") == 1).count() == 10
    # repeated identical equalities keep working
    assert df.filter((F.col("part") == 1) & (F.col("part") == 1)).count() == 10

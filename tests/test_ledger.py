"""Transaction ledger + expiry-safety dry run (round 7): the ledger
reconstructed from manifests must record every data commit exactly
once (replays skipped, maintenance commits classified), and
``expiry_safety`` must predict ``expire_snapshots`` exactly —
including the reference-retention case where shared bucket files keep
snapshots alive past retain_last."""

import pytest

from lakehouse_cdc_spark.maintenance import expire_snapshots, expiry_safety
from lakehouse_cdc_spark.streaming import SnapshotUpsertSink


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id int, v string, operation string, seq int"
    )


def test_ledger_records_commits_replays_and_maintenance(spark, tmp_path):
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], n_buckets=2
    )
    sink.process_batch(_batch(spark, [(1, "a", "c", 0), (2, "b", "c", 0)]), 0)
    sink.process_batch(_batch(spark, [(2, "b2", "u", 1)]), 1)
    sink.process_batch(_batch(spark, [(2, "b2", "u", 1)]), 1)  # replay
    sink.process_batch(_batch(spark, [(3, "c", "c", 2)]), 2)
    sink.rebucket(spark, 4)

    rows = {r.snapshot: r for r in sink.ledger_table(spark).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    # data commits 0..2 carry their own batch ids; the replay left none
    assert [(rows[s].batch_id, rows[s].is_data_commit) for s in (0, 1, 2)] == [
        (0, True),
        (1, True),
        (2, True),
    ]
    # the rebucket advanced the snapshot but carried batch 2
    assert rows[3].batch_id == 2 and rows[3].is_data_commit is False
    assert rows[3].is_committed and not rows[2].is_committed
    # exactly-once audit: every batch id appears on exactly one data commit
    data_batches = [r.batch_id for r in rows.values() if r.is_data_commit]
    assert sorted(data_batches) == [0, 1, 2]
    # rebucket rewrote every bucket under the new map
    assert rows[3].buckets_rewritten > 0


def test_expiry_safety_predicts_expire_snapshots_exactly(spark, tmp_path):
    """Engine-vs-engine: the dry run's would_expire set must equal
    what expire_snapshots then actually removes — on a sink whose
    committed manifest still references OLD snapshots' bucket dirs
    (incremental commits leave untouched buckets behind), so
    reference-retention beats retain_last."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], n_buckets=4
    )
    # 4 commits touching different keys: later manifests keep
    # referencing earlier snapshots' bucket files
    for i in range(4):
        sink.process_batch(_batch(spark, [(i, f"v{i}", "c", i)]), i)

    report = expiry_safety(sink.target_dir, retain_last=1)
    predicted = {r["snapshot"] for r in report if r["would_expire"]}
    kept = {r["snapshot"] for r in report if not r["would_expire"]}
    # the committed snapshot always survives; snapshots referenced by
    # the committed manifest survive retain_last=1 too
    assert 3 in kept
    removed = set(expire_snapshots(sink.target_dir, retain_last=1))
    assert removed == predicted

    # contract check: every snapshot the report kept is still readable
    # and usable as a CDF base; every expired one is refused
    for r in report:
        s = r["snapshot"]
        if r["state_readable_after"]:
            assert sink.state_at(spark, s) is not None
        if not r["cdf_base_usable_after"]:
            with pytest.raises(ValueError):
                sink.changes_between(spark, s, 3)


def test_expiry_safety_after_rebucket_expires_all_history(spark, tmp_path):
    """A full rewrite (rebucket) cuts every reference to older
    snapshots: retain_last=1 then predicts expiring ALL of them, and
    the dry run mutates nothing."""
    import os

    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], n_buckets=2
    )
    for i in range(3):
        sink.process_batch(_batch(spark, [(i, "x", "c", i)]), i)
    sink.rebucket(spark, 4)

    before = sorted(os.listdir(sink.target_dir))
    report = expiry_safety(sink.target_dir, retain_last=1)
    assert sorted(os.listdir(sink.target_dir)) == before  # dry run
    assert [(r["snapshot"], r["would_expire"]) for r in report] == [
        (0, True),
        (1, True),
        (2, True),
        (3, False),
    ]
    assert [r["cdf_base_usable_after"] for r in report] == [
        False,
        False,
        False,
        True,
    ]

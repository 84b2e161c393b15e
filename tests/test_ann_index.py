"""ANN (IVF assignment) index maintenance over the change feed
(round 7): the assignment index maintained from ``changes_between``
alone must equal a full re-assignment rebuild after every commit, and
must keep tracking through feed-silent maintenance (compaction,
rebucket) on the base sink — driven through a FeedCursor, the way a
real consumer runs."""

import pyspark.sql.functions as F

from lakehouse_cdc_spark.streaming import SnapshotUpsertSink
from lakehouse_cdc_spark.streaming.feed import FeedCursor
from lakehouse_cdc_spark.streaming.indexing import (
    ann_index_changes,
    rebuild_ann_index,
)

# four well-separated 4-dim directions; cosine assignment is exact
_CENTROIDS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.0]),
    (2, [0.0, 0.0, 1.0, 0.0]),
]


def _centroids(spark):
    return spark.createDataFrame(
        _CENTROIDS, "cid long, cemb array<float>"
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, operation string, seq long"
    )


def _vec(*towards):
    """A vector leaning towards centroid axis `towards[0]` with a
    small deterministic off-axis component."""
    base = [0.05, 0.04, 0.03, 0.02]
    base[towards[0]] = 1.0
    return [float(x) for x in base]


def _index_state(idx, spark):
    t = idx.current_table(spark)
    if t is None:
        return []
    return sorted((r.vec_id, r.cluster) for r in t.collect())


def _rebuilt(base, spark):
    vis = base.current_table(spark)
    return sorted(
        (r.vec_id, r.cluster)
        for r in rebuild_ann_index(vis, _centroids(spark)).collect()
    )


def test_maintained_ann_index_equals_rebuild_through_all_change_kinds(
    spark, tmp_path
):
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["vec_id"], order_by=["seq"], n_buckets=2
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"), keys=["vec_id"], order_by=["seq"], n_buckets=2
    )
    cents = _centroids(spark)
    cursor = FeedCursor(base, str(tmp_path / "cursor.json"))

    def advance():
        while True:
            feed, to_snap, ack = cursor.next_batch(spark)
            if feed is None:
                return
            idx.process_batch(
                ann_index_changes(feed, cents, snapshot=to_snap), to_snap
            )
            ack()

    # snapshot 0: inserts across two clusters
    base.process_batch(
        _batch(
            spark,
            [
                (10, _vec(0), "c", 0),
                (11, _vec(1), "c", 0),
                (12, _vec(1), "c", 0),
            ],
        ),
        0,
    )
    advance()
    got = _index_state(idx, spark)
    assert got == _rebuilt(base, spark)
    assert got == [(10, 0), (11, 1), (12, 1)]

    # snapshot 1: re-embedding moves vec 11 into cluster 2; new vec 13
    base.process_batch(
        _batch(spark, [(11, _vec(2), "u", 1), (13, _vec(0), "c", 1)]), 1
    )
    advance()
    got = _index_state(idx, spark)
    assert got == _rebuilt(base, spark)
    assert (11, 2) in got

    # snapshot 2: delete vec 10 — its assignment must tombstone
    base.process_batch(_batch(spark, [(10, None, "d", 2)]), 2)
    advance()
    got = _index_state(idx, spark)
    assert got == _rebuilt(base, spark)
    assert all(v != 10 for v, _ in got)

    # untouched vec 12 was NEVER re-assigned: its row still carries
    # its snapshot-0 seq (the O(|feed|) work contract, not O(table))
    seqs = {r.vec_id: r.seq for r in idx.current_table(spark).collect()}
    assert seqs[12] == 0


def test_ann_index_tracks_through_compaction_and_rebucket(spark, tmp_path):
    """Feed-silent base maintenance (compaction, rebucket) must not
    disturb the consumer: the cursor auto-advances over it and the
    maintained index still equals a rebuild afterwards."""
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["vec_id"], order_by=["seq"], n_buckets=2
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"), keys=["vec_id"], order_by=["seq"], n_buckets=2
    )
    cents = _centroids(spark)
    cursor = FeedCursor(base, str(tmp_path / "cursor.json"))

    def advance():
        while True:
            feed, to_snap, ack = cursor.next_batch(spark)
            if feed is None:
                return
            idx.process_batch(
                ann_index_changes(feed, cents, snapshot=to_snap), to_snap
            )
            ack()

    base.process_batch(
        _batch(spark, [(i, _vec(i % 3), "c", 0) for i in range(6)]), 0
    )
    advance()
    assert _index_state(idx, spark) == _rebuilt(base, spark)

    # feed-silent: compaction rewrite, then a partition evolution
    base.compact_buckets(spark)
    base.rebucket(spark, 4)
    advance()  # cursor must skip the silent snapshots without output
    assert _index_state(idx, spark) == _rebuilt(base, spark)

    # changes AFTER the rebucket still flow
    base.process_batch(
        _batch(
            spark,
            [(1, _vec(2), "u", 1), (6, _vec(1), "c", 1), (2, None, "d", 1)],
        ),
        1,
    )
    advance()
    got = _index_state(idx, spark)
    assert got == _rebuilt(base, spark)
    assert (1, 2) in got and (6, 1) in got and all(v != 2 for v, _ in got)


def test_ann_index_replay_is_idempotent(spark, tmp_path):
    """Replaying a snapshot's index batch (crash between index commit
    and cursor ack) leaves the index unchanged — seq = snapshot makes
    the upsert last-write-wins idempotent."""
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["vec_id"], order_by=["seq"], n_buckets=1
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"), keys=["vec_id"], order_by=["seq"], n_buckets=1
    )
    base.process_batch(_batch(spark, [(1, _vec(0), "c", 0)]), 0)
    feed = base.changes_between(spark, -1, 0)
    changes = ann_index_changes(feed, _centroids(spark), snapshot=0)
    idx.process_batch(changes, 0)
    before = _index_state(idx, spark)
    idx.process_batch(changes, 1)  # replay under a NEW batch id
    assert _index_state(idx, spark) == before

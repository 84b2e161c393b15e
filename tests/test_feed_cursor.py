"""Checkpointed feed consumption (round 6): FeedCursor delivers every
committed change exactly once across consumer crashes — replay before
ack, never after — and drains a far-behind backlog in bounded chunks."""

import pyspark.sql.functions as F

from lakehouse_cdc_spark.streaming import SnapshotUpsertSink
from lakehouse_cdc_spark.streaming.feed import FeedCursor


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id int, v string, operation string, seq int"
    )


def test_cursor_delivers_exactly_once_across_crashes(spark, tmp_path):
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], n_buckets=2
    )
    cur = FeedCursor(sink, str(tmp_path / "cursor.json"))

    # nothing committed yet
    df, _, _ = cur.next_batch(spark)
    assert df is None

    sink.process_batch(_batch(spark, [(1, "a", "c", 0), (2, "b", "c", 0)]), 0)
    df, snap, ack = cur.next_batch(spark)
    got = sorted((r.id, r.v) for r in df.collect())
    assert got == [(1, "a"), (2, "b")] and snap == 0

    # CRASH before ack: the same batch replays identically
    df2, snap2, ack2 = cur.next_batch(spark)
    assert snap2 == 0
    assert sorted((r.id, r.v) for r in df2.collect()) == got
    ack2()

    # after ack: nothing pending until a new commit
    df3, _, _ = cur.next_batch(spark)
    assert df3 is None
    sink.process_batch(_batch(spark, [(1, "a2", "u", 1)]), 1)
    df4, snap4, ack4 = cur.next_batch(spark)
    assert [(r.id, r.v) for r in df4.collect()] == [(1, "a2")] and snap4 == 1
    ack4()

    # a stale ack (older batch acknowledged after a newer one) refuses
    import pytest

    sink.process_batch(_batch(spark, [(3, "c", "c", 2)]), 2)
    dfa, _, acka = cur.next_batch(spark)
    dfa.collect()
    acka()
    with pytest.raises(ValueError, match="backwards"):
        ack4()  # cursor already at 2


def test_cursor_drains_backlog_in_bounded_chunks(spark, tmp_path):
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], n_buckets=1
    )
    for i in range(7):
        sink.process_batch(_batch(spark, [(i, f"v{i}", "c", i)]), i)
    cur = FeedCursor(sink, str(tmp_path / "cursor.json"))

    seen, rounds = [], 0
    while True:
        df, snap, ack = cur.next_batch(spark, max_snapshots=3)
        if df is None:
            break
        seen += [(r.id, r._change_snapshot) for r in df.collect()]
        ack()
        rounds += 1
    assert rounds == 3  # 7 snapshots in chunks of 3: 3 + 3 + 1
    assert sorted(seen) == [(i, i) for i in range(7)]

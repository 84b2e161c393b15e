"""Incremental inverted-index maintenance over the change feed
(round 6): the postings index maintained from ``changes_between``
alone must equal a full rebuild after every commit, and each index
batch must be minimal (unchanged postings never re-emitted)."""

import pyspark.sql.functions as F

from lakehouse_cdc_spark.streaming import SnapshotUpsertSink
from lakehouse_cdc_spark.streaming.indexing import (
    rebuild_token_index,
    token_index_changes,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc int, text string, operation string, seq int"
    )


def _index_state(index_sink, spark):
    t = index_sink.current_table(spark)
    return sorted((r.token, r.doc, r.tf) for r in t.collect()) if t is not None else []


def _rebuilt(base_sink, spark):
    vis = base_sink.current_table(spark)
    return sorted(
        (r.token, r.doc, r.tf)
        for r in rebuild_token_index(vis, ["doc"]).collect()
    )


def test_maintained_index_equals_rebuild_through_all_change_kinds(
    spark, tmp_path
):
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=2
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"),
        keys=["token", "doc"],
        order_by=["seq"],
        n_buckets=4,
    )

    def advance(from_snap, to_snap):
        for s in range(from_snap + 1, to_snap + 1):
            feed = base.changes_between(spark, s - 1, s)
            if feed is None or not feed.take(1):
                continue
            prev = base.state_at(spark, s - 1).filter(
                F.col("operation") != "d"
            ) if s > 0 else feed.limit(0)
            changes = token_index_changes(feed, prev, ["doc"], snapshot=s)
            idx.process_batch(changes, s)

    # snapshot 0: inserts
    base.process_batch(
        _batch(
            spark,
            [
                (1, "spark merges rows", "c", 0),
                (2, "spark spark vectors", "c", 0),
                (3, "quiet document", "c", 0),
            ],
        ),
        0,
    )
    advance(-1, 0)
    assert _index_state(idx, spark) == _rebuilt(base, spark)

    # snapshot 1: update doc 2 (loses 'vectors', tf of 'spark' drops),
    # insert doc 4
    base.process_batch(
        _batch(
            spark,
            [(2, "spark rows", "u", 1), (4, "merges merges", "c", 1)],
        ),
        1,
    )
    advance(0, 1)
    assert _index_state(idx, spark) == _rebuilt(base, spark)

    # snapshot 2: delete doc 1 — all of its postings must tombstone
    base.process_batch(_batch(spark, [(1, None, "d", 2)]), 2)
    advance(1, 2)
    got = _index_state(idx, spark)
    assert got == _rebuilt(base, spark)
    assert all(doc != 1 for _, doc, _ in got)

    # untouched doc 3's postings were NEVER re-emitted: its index rows
    # still carry their snapshot-0 seq
    seqs = {
        (r.token, r.doc): r.seq
        for r in idx.current_table(spark).collect()
    }
    assert seqs[("quiet", 3)] == 0 and seqs[("document", 3)] == 0


def test_index_batches_are_minimal(spark, tmp_path):
    """An update that keeps a token's tf unchanged must not re-emit
    that posting — only the actual postings diff flows to the index."""
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=1
    )
    base.process_batch(
        _batch(spark, [(1, "alpha beta beta", "c", 0)]), 0
    )
    base.process_batch(
        _batch(spark, [(1, "alpha beta gamma", "u", 1)]), 1
    )
    feed = base.changes_between(spark, 0, 1)
    prev = base.state_at(spark, 0).filter(F.col("operation") != "d")
    changes = token_index_changes(feed, prev, ["doc"], snapshot=1).collect()
    got = sorted((r.token, r.tf, r.operation) for r in changes)
    # alpha unchanged (tf 1→1): absent.  beta 2→1: upsert.  gamma new:
    # upsert.  nothing deleted.
    assert got == [("beta", 1, "u"), ("gamma", 1, "u")]


def test_index_replay_is_idempotent(spark, tmp_path):
    """Replaying the same snapshot's index batch (crash between index
    commit and consumer checkpoint) must leave the index unchanged —
    seq = snapshot makes the upsert last-write-wins idempotent."""
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=1
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"),
        keys=["token", "doc"],
        order_by=["seq"],
        n_buckets=2,
    )
    base.process_batch(_batch(spark, [(1, "one two", "c", 0)]), 0)
    feed = base.changes_between(spark, -1, 0)
    prev = feed.limit(0)
    changes = token_index_changes(feed, prev, ["doc"], snapshot=0)
    idx.process_batch(changes, 0)
    before = _index_state(idx, spark)
    idx.process_batch(changes, 1)  # replay under a NEW batch id
    assert _index_state(idx, spark) == before


# ---------------------------------------------------------------------------
# MinHash-LSH band-index maintenance (round 7)
# ---------------------------------------------------------------------------

from lakehouse_cdc_spark.streaming.indexing import (  # noqa: E402
    lsh_index_changes,
    rebuild_lsh_index,
)


def _lsh_state(index_sink, spark):
    t = index_sink.current_table(spark)
    if t is None:
        return []
    return sorted((r.doc, r.band, r.band_key) for r in t.collect())


def _lsh_rebuilt(base_sink, spark):
    vis = base_sink.current_table(spark)
    return sorted(
        (r.doc, r.band, r.band_key)
        for r in rebuild_lsh_index(vis).collect()
    )


def test_maintained_lsh_index_equals_rebuild(spark, tmp_path):
    """The banded MinHash index maintained from changes_between alone
    must equal a full-rebuild after inserts, a text edit (which moves
    band keys), and a delete."""
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=2
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"),
        keys=["doc", "band"],
        order_by=["seq"],
        n_buckets=4,
    )

    def advance(snap):
        feed = base.changes_between(spark, snap - 1, snap)
        idx.process_batch(lsh_index_changes(feed, snapshot=snap), snap)

    base.process_batch(
        _batch(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog", "c", 0),
                (2, "the quick brown fox jumps over the lazy cat", "c", 0),
                (3, "completely different text about spark engines", "c", 0),
            ],
        ),
        0,
    )
    advance(0)
    assert _lsh_state(idx, spark) == _lsh_rebuilt(base, spark)
    # every live doc carries exactly 4 band rows
    assert len(_lsh_state(idx, spark)) == 12

    before = dict(
        ((d, b), k) for d, b, k in _lsh_state(idx, spark) if d == 3
    )
    base.process_batch(
        _batch(
            spark,
            [
                (3, "entirely new words now live in document three", "u", 1),
                (4, "the quick brown fox jumps over the lazy dog", "c", 1),
            ],
        ),
        1,
    )
    advance(1)
    assert _lsh_state(idx, spark) == _lsh_rebuilt(base, spark)
    after = dict(((d, b), k) for d, b, k in _lsh_state(idx, spark) if d == 3)
    # the edit rewrote doc 3's shingles → its band keys moved
    assert before != after
    # exact duplicates (1 and 4) share every band key
    rows = _lsh_state(idx, spark)
    k1 = sorted(k for d, b, k in rows if d == 1)
    k4 = sorted(k for d, b, k in rows if d == 4)
    assert k1 == k4

    base.process_batch(_batch(spark, [(2, None, "d", 2)]), 2)
    advance(2)
    assert _lsh_state(idx, spark) == _lsh_rebuilt(base, spark)
    assert not any(d == 2 for d, _, _ in _lsh_state(idx, spark))


def test_lsh_index_replay_is_idempotent(spark, tmp_path):
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=1
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"),
        keys=["doc", "band"],
        order_by=["seq"],
        n_buckets=2,
    )
    base.process_batch(_batch(spark, [(1, "one two three four", "c", 0)]), 0)
    feed = base.changes_between(spark, -1, 0)
    changes = lsh_index_changes(feed, snapshot=0)
    idx.process_batch(changes, 0)
    before = _lsh_state(idx, spark)
    idx.process_batch(changes, 1)  # replay under a NEW batch id
    assert _lsh_state(idx, spark) == before


def test_lsh_index_null_text_update_leaves_no_stale_bands(spark, tmp_path):
    """A contract-violating live update carrying NULL text must
    tombstone the doc's bands (not leave the old signature behind)."""
    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=1
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"),
        keys=["doc", "band"],
        order_by=["seq"],
        n_buckets=2,
    )
    base.process_batch(
        _batch(spark, [(1, "alpha beta gamma delta", "c", 0)]), 0
    )
    idx.process_batch(
        lsh_index_changes(base.changes_between(spark, -1, 0), snapshot=0), 0
    )
    assert len(_lsh_state(idx, spark)) == 4
    base.process_batch(_batch(spark, [(1, None, "u", 1)]), 1)
    idx.process_batch(
        lsh_index_changes(base.changes_between(spark, 0, 1), snapshot=1), 1
    )
    assert _lsh_state(idx, spark) == []


def test_token_index_tracks_through_compaction_and_rebucket(spark, tmp_path):
    """FeedCursor-driven postings maintenance must keep equaling a
    full rebuild through feed-silent base maintenance (compaction,
    rebucket) interleaved with real inserts, edits, and deletes — the
    text analog of the ANN/LSH co-stress, closing VERDICT r7 item 5's
    test requirement for the search-index family."""
    from lakehouse_cdc_spark.streaming.feed import FeedCursor
    from lakehouse_cdc_spark.streaming.indexing import rebuild_token_index

    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=2
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"),
        keys=["token", "doc"],
        order_by=["seq"],
        n_buckets=4,
    )
    cursor = FeedCursor(base, str(tmp_path / "cursor.json"))

    def advance():
        while True:
            feed, to_snap, ack = cursor.next_batch(spark)
            if feed is None:
                return
            prev = base.state_at(spark, to_snap - 1).filter(
                F.col("operation") != "d"
            ) if to_snap > 0 else feed.limit(0)
            idx.process_batch(
                token_index_changes(feed, prev, ["doc"], snapshot=to_snap),
                to_snap,
            )
            ack()

    def maintained():
        t = idx.current_table(spark)
        return sorted((r.token, r.doc, r.tf) for r in t.collect())

    def rebuilt():
        vis = base.current_table(spark)
        return sorted(
            (r.token, r.doc, r.tf)
            for r in rebuild_token_index(vis, ["doc"]).collect()
        )

    base.process_batch(
        _batch(
            spark,
            [
                (1, "spark merge spark", "c", 0),
                (2, "vector search with spark", "c", 0),
                (3, "unrelated words entirely", "c", 0),
            ],
        ),
        0,
    )
    advance()
    assert maintained() == rebuilt()

    # feed-silent maintenance: compaction + rebucket, then real changes
    base.compact_buckets(spark)
    base.rebucket(spark, 4)
    base.process_batch(
        _batch(
            spark,
            [
                (1, "spark merge merge merge", "u", 3),  # tf shifts
                (4, "vector vector merge", "c", 3),
            ],
        ),
        3,
    )
    advance()
    assert maintained() == rebuilt()
    # the edit changed doc 1's tf for 'merge' from 1 to 3
    assert ("merge", 1, 3) in maintained()

    base.process_batch(_batch(spark, [(2, None, "d", 4)]), 4)
    advance()
    assert maintained() == rebuilt()
    assert all(d != 2 for _, d, _ in maintained())


def test_maintained_dedup_groups_equal_rebuild_stepwise(spark, tmp_path):
    """Append-only group maintenance must equal a from-scratch rebuild
    after EVERY batch — including a cross-batch merge (a new doc
    near-dups members of two different existing groups) — and must
    refuse non-insert feeds (a delete can split a group)."""
    import pytest

    from lakehouse_cdc_spark.streaming.indexing import (
        dedup_groups_changes,
        lsh_index_changes,
        rebuild_dedup_groups,
    )

    base = SnapshotUpsertSink(
        str(tmp_path / "base"), keys=["doc"], order_by=["seq"], n_buckets=2
    )
    idx = SnapshotUpsertSink(
        str(tmp_path / "idx"),
        keys=["doc", "band"],
        order_by=["seq"],
        n_buckets=4,
    )
    lab = SnapshotUpsertSink(
        str(tmp_path / "lab"), keys=["doc"], order_by=["seq"], n_buckets=2
    )

    def advance(snap):
        feed = base.changes_between(spark, snap - 1, snap)
        prev_index = idx.current_table(spark) if snap > 0 else None
        prev_labels = lab.current_table(spark) if snap > 0 else None
        lab.process_batch(
            dedup_groups_changes(feed, prev_labels, prev_index, snapshot=snap),
            snap,
        )
        idx.process_batch(lsh_index_changes(feed, snapshot=snap), snap)

    def maintained():
        return sorted(
            (r.doc, r.label) for r in lab.current_table(spark).collect()
        )

    def rebuilt():
        return sorted(
            (r.doc, r.label)
            for r in rebuild_dedup_groups(
                base.current_table(spark)
            ).collect()
        )

    a = "the quick brown fox jumps over the lazy dog tonight"
    b = "pack my box with five dozen fresh liquor jugs today"
    # batch 0: two separate near-dup seeds + one unique doc
    base.process_batch(
        _batch(
            spark,
            [(1, a, "c", 0), (5, b, "c", 0),
             (9, "completely unrelated text about spark engines", "c", 0)],
        ),
        0,
    )
    advance(0)
    assert maintained() == rebuilt()

    # batch 1: near-dups of each seed -> two groups grow independently
    base.process_batch(
        _batch(
            spark,
            [(2, a.replace("tonight", "tomorrow"), "c", 1),
             (6, b.replace("today", "tonight"), "c", 1)],
        ),
        1,
    )
    advance(1)
    got = maintained()
    assert got == rebuilt()
    labels = dict(got)
    assert labels[2] == labels[1] and labels[6] == labels[5]
    assert labels[1] != labels[5]

    # batch 2: a BRIDGE doc sharing bands with both groups merges them
    bridge = (
        a.rsplit(" ", 1)[0] + " " + b
    )  # front half shingles ~ group A, back half ~ group B
    base.process_batch(_batch(spark, [(3, bridge, "c", 2)]), 2)
    advance(2)
    got = maintained()
    assert got == rebuilt()
    labels = dict(got)
    if labels[3] == labels[1]:  # bridge actually connected both sides
        assert labels[5] == labels[1]

    # non-insert feeds are refused loudly
    base.process_batch(_batch(spark, [(9, None, "d", 3)]), 3)
    feed = base.changes_between(spark, 2, 3)
    with pytest.raises(ValueError, match="append-only"):
        dedup_groups_changes(
            feed,
            lab.current_table(spark),
            idx.current_table(spark),
            snapshot=3,
        ).take(1)

"""Merge-on-read sink mode: delta appends, on-the-fly compacted reads,
threshold folding, COW handoff, maintenance interplay, time travel.

The MOR/COW duality mirrors Hudi's table types (and Iceberg's
merge-on-read row-level operations): MOR commits are O(batch) delta
appends — the ingest-heavy posture — and reads compact base+deltas
until fold_deltas() re-buckets.  Every test asserts the invariant that
matters: a MOR sink's visible state is ALWAYS equal to the equivalent
copy-on-write state, before and after any fold.
"""

from __future__ import annotations

import os

import pytest

from lakehouse_cdc_spark.streaming import SnapshotUpsertSink

SCHEMA = "id int, v string, operation string, seq int"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, sink):
    return {r.id: r.v for r in sink.current_table(spark).collect()}


def test_mor_delta_appends_and_read_compaction(spark, tmp_path):
    """Two MOR batches commit as pure delta appends (bucket map stays
    empty, no bucket dir written), yet current_table serves the fully
    compacted upsert/delete view."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"),
        keys=["id"],
        order_by=["seq"],
        n_buckets=4,
        merge_on_read=True,
        fold_deltas_every=None,  # manual folding only
    )
    sink.process_batch(_mk(spark, [(i, f"v{i}", "u", 0) for i in range(8)]), 0)
    sink.process_batch(
        _mk(spark, [(3, "v3-new", "u", 1), (5, None, "d", 1), (9, "v9", "c", 1)]),
        1,
    )
    assert sink.pending_deltas() == [0, 1]
    m = sink._read_manifest(1)
    assert m["buckets"] == {}  # nothing folded yet
    assert os.path.isdir(sink._delta_path(0))
    assert not os.path.isdir(os.path.join(sink._snapshot_path(0), "__bucket=0"))

    state = _state(spark, sink)
    assert state[3] == "v3-new"  # newer delta wins
    assert 5 not in state  # tombstone hides the key
    assert state[9] == "v9" and state[0] == "v0" and len(state) == 8


def test_mor_equals_cow_before_and_after_fold(spark, tmp_path):
    """The MOR sink's visible state must be identical to a COW sink fed
    the same batches — both while deltas are pending and after folding;
    the fold also leaves one file per touched bucket."""
    batches = [
        [(i, f"a{i}", "u", 0) for i in range(16)],
        [(i, f"b{i}", "u", 1) for i in range(0, 16, 2)] + [(1, None, "d", 1)],
        [(16, "c16", "c", 2), (2, None, "d", 2), (3, "c3", "u", 2)],
    ]
    mor = SnapshotUpsertSink(
        str(tmp_path / "mor"), keys=["id"], order_by=["seq"],
        n_buckets=4, merge_on_read=True, fold_deltas_every=None,
    )
    cow = SnapshotUpsertSink(
        str(tmp_path / "cow"), keys=["id"], order_by=["seq"], n_buckets=4
    )
    for i, rows in enumerate(batches):
        mor.process_batch(_mk(spark, rows), i)
        cow.process_batch(_mk(spark, rows), i)
    assert _state(spark, mor) == _state(spark, cow)  # pre-fold

    folded = mor.fold_deltas(spark)
    assert folded == 3
    assert mor.pending_deltas() == []
    assert _state(spark, mor) == _state(spark, cow)  # post-fold
    # folded layout: every touched bucket holds exactly one file
    per_bucket = {
        r["bucket"]: r["count"]
        for r in mor.files_table(spark).groupBy("bucket").count().collect()
    }
    assert per_bucket and all(c == 1 for c in per_bucket.values())
    assert None not in per_bucket  # no delta files remain live
    # a second fold is a no-op (no extra commit)
    snap = mor.committed_snapshot()
    assert mor.fold_deltas(spark) == 0
    assert mor.committed_snapshot() == snap


def test_mor_auto_fold_at_threshold(spark, tmp_path):
    """fold_deltas_every=3: the third delta commit triggers an
    automatic fold — pending list clears, buckets materialize."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"],
        n_buckets=4, merge_on_read=True, fold_deltas_every=3,
    )
    sink.process_batch(_mk(spark, [(1, "a", "u", 0)]), 0)
    sink.process_batch(_mk(spark, [(2, "b", "u", 1)]), 1)
    assert sink.pending_deltas() == [0, 1]
    sink.process_batch(_mk(spark, [(3, "c", "u", 2)]), 2)
    assert sink.pending_deltas() == []
    assert sink._read_manifest(sink.committed_snapshot())["buckets"]
    assert _state(spark, sink) == {1: "a", 2: "b", 3: "c"}


def test_mor_replay_is_idempotent(spark, tmp_path):
    """A replayed batch id on the same lineage is a committed no-op —
    no extra delta, no state change."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"],
        merge_on_read=True, fold_deltas_every=None, lineage="ck-1",
    )
    sink.process_batch(_mk(spark, [(1, "a", "u", 0)]), 0)
    sink.process_batch(_mk(spark, [(1, "a-DUP", "u", 0)]), 0)  # replay
    assert sink.pending_deltas() == [0]
    assert _state(spark, sink) == {1: "a"}


def test_mor_cow_handoff_folds_first(spark, tmp_path):
    """Reopening a MOR target with a plain COW sink folds the pending
    deltas before merging the new batch — no delta rows are lost and
    the manifest ends fully bucketed."""
    d = str(tmp_path / "t")
    mor = SnapshotUpsertSink(
        d, keys=["id"], order_by=["seq"], n_buckets=4,
        merge_on_read=True, fold_deltas_every=None,
    )
    mor.process_batch(_mk(spark, [(1, "a", "u", 0), (2, "b", "u", 0)]), 0)
    mor.process_batch(_mk(spark, [(2, "b2", "u", 1)]), 1)

    cow = SnapshotUpsertSink(d, keys=["id"], order_by=["seq"], n_buckets=4)
    cow.process_batch(_mk(spark, [(3, "c", "c", 2)]), 2)
    assert cow.pending_deltas() == []
    assert _state(spark, cow) == {1: "a", 2: "b2", 3: "c"}


def test_mor_time_travel_compacts_at_snapshot(spark, tmp_path):
    """state_at on a delta-bearing snapshot serves the compacted state
    AS OF that snapshot (later deltas invisible)."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"],
        merge_on_read=True, fold_deltas_every=None,
    )
    sink.process_batch(_mk(spark, [(1, "a", "u", 0), (2, "b", "u", 0)]), 0)
    sink.process_batch(_mk(spark, [(1, "a2", "u", 1)]), 1)
    at0 = {r.id: r.v for r in sink.state_at(spark, 0).collect()}
    assert at0 == {1: "a", 2: "b"}
    at1 = {r.id: r.v for r in sink.state_at(spark, 1).collect()}
    assert at1 == {1: "a2", 2: "b"}


def test_mor_gc_tombstones_folds_first(spark, tmp_path):
    """gc_tombstones on a MOR sink with a tombstone still in a delta:
    the fold runs first, then GC expires it — the key stays deleted
    and cannot resurrect via the late-data floor."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"],
        n_buckets=2, merge_on_read=True, fold_deltas_every=None,
    )
    sink.process_batch(_mk(spark, [(1, "a", "u", 10), (2, "b", "u", 10)]), 0)
    sink.process_batch(_mk(spark, [(1, None, "d", 20)]), 1)
    assert sink.pending_deltas() == [0, 1]
    n = sink.gc_tombstones(spark, 50)  # tombstone seq=20 < 50 → expire
    assert n == 1
    assert sink.pending_deltas() == []
    state = sink.current_state(spark)
    ops = {r.id: r.operation for r in state.collect()}
    assert 1 not in ops  # tombstone physically gone
    assert _state(spark, sink) == {2: "b"}
    # late straggler below the floor is dropped, not resurrected
    sink.process_batch(_mk(spark, [(1, "ghost", "u", 15)]), 2)
    assert _state(spark, sink) == {2: "b"}


def test_mor_expire_snapshots_keeps_referenced_deltas(spark, tmp_path):
    """expire_snapshots must not delete v= dirs still referenced as
    deltas by a retained manifest; after folding they become
    reclaimable."""
    from lakehouse_cdc_spark.maintenance import expire_snapshots

    d = str(tmp_path / "t")
    sink = SnapshotUpsertSink(
        d, keys=["id"], order_by=["seq"], n_buckets=2,
        merge_on_read=True, fold_deltas_every=None,
    )
    for i in range(4):
        sink.process_batch(_mk(spark, [(i, f"v{i}", "u", i)]), i)
    # retain only the last manifest — its deltas [0..3] must survive
    expired = expire_snapshots(d, retain_last=1)
    assert expired == []
    assert _state(spark, sink) == {i: f"v{i}" for i in range(4)}

    sink.fold_deltas(spark)  # v=4 holds the folded buckets
    expired = expire_snapshots(d, retain_last=1)
    assert set(expired) == {0, 1, 2, 3}
    assert _state(spark, sink) == {i: f"v{i}" for i in range(4)}


def test_mor_schema_evolution_across_deltas(spark, tmp_path):
    """A delta batch adding a column: older delta rows read as NULL
    through the manifest-tracked union schema, both pre- and
    post-fold."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"],
        n_buckets=2, merge_on_read=True, fold_deltas_every=None,
    )
    sink.process_batch(_mk(spark, [(1, "a", "u", 0)]), 0)
    wide = spark.createDataFrame(
        [(2, "b", "u", 1, "extra")],
        "id int, v string, operation string, seq int, note string",
    )
    sink.process_batch(wide, 1)
    rows = {r.id: r for r in sink.current_table(spark).collect()}
    assert rows[1].note is None and rows[2].note == "extra"
    sink.fold_deltas(spark)
    rows = {r.id: r for r in sink.current_table(spark).collect()}
    assert rows[1].note is None and rows[2].note == "extra"


def test_mor_cdc_pipeline_stream_equals_batch(spark, sf_dir, tmp_path):
    """The full streaming path (file source → checkpointed foreachBatch
    → MOR sink with auto-fold) must land on the batch-computed
    last-write-wins state — the same differential check as the COW
    pipeline e2e, through the delta commit path."""
    from pyspark.sql import functions as F

    from lakehouse_cdc_spark.operators.dedup import latest_per_key
    from lakehouse_cdc_spark.plans.registry import table
    from lakehouse_cdc_spark.streaming import cdc_pipeline, file_cdc_source

    op = (
        F.when(F.col("event_type") == "error", F.lit("d"))
        .when(F.col("event_type") == "signup", F.lit("c"))
        .otherwise(F.lit("u"))
    )
    e = table(spark, sf_dir, "events").withColumn("operation", op).limit(600)
    src = str(tmp_path / "changes")
    # 3 files → 3 micro-batches (LWW over a total order_by makes the
    # final state independent of how changes split across batches)
    e.repartition(3).write.parquet(src)
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for root, _, files in sorted(os.walk(src)):
        for f_ in sorted(files):
            if f_.endswith(".parquet"):
                os.link(os.path.join(root, f_), os.path.join(flat, f"{i}.pq"))
                i += 1
    sink = SnapshotUpsertSink(
        str(tmp_path / "target"),
        keys=["user_id"],
        order_by=["ts", "event_id"],
        merge_on_read=True,
        fold_deltas_every=2,
    )
    q = cdc_pipeline(
        file_cdc_source(spark, flat, e.schema, max_files_per_trigger=1),
        sink,
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    got = {
        (r.user_id, r.event_id)
        for r in sink.current_table(spark).select("user_id", "event_id").collect()
    }
    expected = {
        (r.user_id, r.event_id)
        for r in latest_per_key(e, ["user_id"], ["ts", "event_id"])
        .filter(F.col("operation") != "d")
        .collect()
    }
    assert got == expected


def test_mor_crash_mid_fold_rolls_back_and_retries(spark, tmp_path):
    """A fold that dies after writing bucket data but before its
    manifest: recover_interrupted_commit rolls the orphan snapshot
    back, the deltas stay live (reads unaffected), and a retried fold
    completes cleanly."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"],
        n_buckets=2, merge_on_read=True, fold_deltas_every=None,
    )
    sink.process_batch(_mk(spark, [(1, "a", "u", 0), (2, "b", "u", 0)]), 0)
    sink.process_batch(_mk(spark, [(1, "a2", "u", 1)]), 1)
    # simulate the crashed fold: maintenance claim + partial bucket
    # data under the next snapshot, no manifest
    crash_snap = sink.committed_snapshot() + 1
    with open(sink._claim_path(crash_snap), "w") as f:
        f.write(":")  # maintenance claim (lineage-less, batch_id=None)
    os.makedirs(os.path.join(sink._snapshot_path(crash_snap), "__bucket=0"))
    assert sink.recover_interrupted_commit() == "rolled_back"
    assert sink.pending_deltas() == [0, 1]  # deltas untouched
    assert _state(spark, sink) == {1: "a2", 2: "b"}
    assert sink.fold_deltas(spark) == 2  # retry completes
    assert sink.pending_deltas() == []
    assert _state(spark, sink) == {1: "a2", 2: "b"}


def test_mor_recover_interrupted_delta_write(spark, tmp_path):
    """A claim with a half-written delta dir but no manifest rolls
    BACK (data never committed); with a manifest it rolls FORWARD."""
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"],
        merge_on_read=True, fold_deltas_every=None, lineage="ck",
    )
    sink.process_batch(_mk(spark, [(1, "a", "u", 0)]), 0)
    # simulate a crash: claim taken, delta dir written, no manifest
    os.makedirs(sink._delta_path(1))
    with open(sink._claim_path(1), "w") as f:
        f.write("ck:1")
    assert sink.recover_interrupted_commit() == "rolled_back"
    assert not os.path.isdir(sink._snapshot_path(1))
    assert _state(spark, sink) == {1: "a"}
    # next batch proceeds normally on the recovered target
    sink.process_batch(_mk(spark, [(2, "b", "u", 1)]), 1)
    assert _state(spark, sink) == {1: "a", 2: "b"}


def test_aqe_guard_is_refcounted_across_concurrent_writers(spark):
    """Two interleaved writers on one session must not wedge the AQE
    conf: the naive save/set/restore pattern would restore writer A's
    'false' as the session value; the refcounted guard restores the
    TRUE original only when the last writer exits."""
    from lakehouse_cdc_spark.streaming.pipeline import _aqe_disabled

    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    assert orig == "true"
    a = _aqe_disabled(spark)
    b = _aqe_disabled(spark)
    a.__enter__()
    assert spark.conf.get(key) == "false"
    b.__enter__()  # concurrent writer enters while A holds it off
    a.__exit__(None, None, None)
    assert spark.conf.get(key) == "false"  # B still inside
    b.__exit__(None, None, None)
    assert spark.conf.get(key) == "true"  # true original restored


def test_schema_widening_keeps_tracking_and_reads_narrow_files(
    spark, tmp_path
):
    """A column whose type WIDENS across batches (int → long): the
    manifest-tracked schema widens with it (the explicit reader
    upcasts the untouched narrow bucket files), so schema tracking —
    and correct reads — survive the most common evolution.  Truly
    incompatible collisions still drop tracking."""
    import json as _json

    from pyspark.sql import types as T

    from lakehouse_cdc_spark.streaming.pipeline import _union_schema_json

    # pure-function contract: int→long widens, int→string does not
    s1 = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    js = _union_schema_json(None, s1)
    widened = _union_schema_json(
        js, T.StructType([T.StructField("id", T.LongType())])
    )
    assert widened is not None
    assert {
        f["name"]: f["type"] for f in _json.loads(widened)["fields"]
    } == {"id": "long", "v": "string"}
    assert (
        _union_schema_json(js, T.StructType([T.StructField("v", T.LongType())]))
        is None
    )

    # sink level: batch 0 writes v as int into bucket files; batch 1
    # widens v to long for a DIFFERENT key (other bucket untouched)
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["k"], order_by=["seq"], n_buckets=2
    )
    sink.process_batch(
        spark.createDataFrame(
            [(1, 1, "u", 0)], "k int, v int, operation string, seq int"
        ),
        0,
    )
    assert "schema" in sink._read_manifest(0)
    big = 2**40
    sink.process_batch(
        spark.createDataFrame(
            [(2, big, "u", 1)], "k int, v long, operation string, seq int"
        ),
        1,
    )
    m = sink._read_manifest(sink.committed_snapshot())
    assert "schema" in m  # tracking SURVIVED via widening
    types = {
        f["name"]: f["type"] for f in _json.loads(m["schema"])["fields"]
    }
    assert types["v"] == "long"
    state = {r.k: r.v for r in sink.current_table(spark).collect()}
    assert state == {1: 1, 2: big}
    # the narrow int bucket file is still readable through the wide
    # tracked schema on the NEXT merge too
    sink.process_batch(
        spark.createDataFrame(
            [(1, 7, "u", 2)], "k int, v long, operation string, seq int"
        ),
        2,
    )
    state = {r.k: r.v for r in sink.current_table(spark).collect()}
    assert state == {1: 7, 2: big}

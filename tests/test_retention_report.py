"""Retention-pin visibility (round 12): the pin rules that make
retention SAFE (tags/branches, registered cursor floors, writer-claim
files) can also make it SILENT — a crashed writer's claim or an
abandoned named cursor pins snapshots forever with nothing in
``expire_snapshots``'s return value saying why.  ``retention_report``
names every pin with its floor, lag, cost (extra snapshots kept), and
staleness; ``expire_snapshots`` warns when a cursor pin is the binding
constraint."""

import logging
import os
import time

from lakehouse_cdc_spark.maintenance import expire_snapshots, retention_report
from lakehouse_cdc_spark.streaming import SnapshotUpsertSink
from lakehouse_cdc_spark.streaming.feed import FeedCursor


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id int, v string, operation string, seq int"
    )


def _sink_with_history(spark, tmp_path, n_commits=4):
    sink = SnapshotUpsertSink(
        str(tmp_path / "t"), keys=["id"], order_by=["seq"], n_buckets=1
    )
    for i in range(n_commits):
        sink.process_batch(_batch(spark, [(i, f"v{i}", "c", i)]), i)
    return sink


def test_report_names_dead_claim_and_stale_cursor(spark, tmp_path):
    """The two silent-pin shapes the round-11 review worried about —
    a crashed writer's claim file and a registered cursor that never
    acks — must both appear in the report with floor, lag, cost, and a
    nonzero age."""
    sink = _sink_with_history(spark, tmp_path)  # snapshots 0..3

    # abandoned consumer: registers (pin = acked floor = -1), never acks
    FeedCursor(sink, str(tmp_path / "dead.cursor"), name="abandoned")
    # lagging-but-live consumer: acked snapshot 0, then fell behind
    live = FeedCursor(sink, str(tmp_path / "live.cursor"), name="analytics")
    df, _, ack = live.next_batch(spark, max_snapshots=1)
    df.collect()
    ack()
    # crashed writer: a claim file left behind on snapshot 2 (recovery
    # hasn't run); backdate its mtime so age is clearly positive
    claim = os.path.join(sink.target_dir, "v=2.claim")
    with open(claim, "w") as f:
        f.write("crashed-lineage:99")
    os.utime(claim, (time.time() - 3600, time.time() - 3600))
    sink.create_tag("audit", snapshot=1)

    rows = retention_report(sink.target_dir, retain_last=1)
    by_key = {(r["kind"], r["name"]): r for r in rows}

    dead = by_key[("cursor", "abandoned")]
    assert dead["floor"] == -1
    assert dead["lag"] == 4  # committed 3 - floor -1
    assert dead["extra_kept"] >= 1  # it alone holds pre-tail history
    assert dead["age_seconds"] is not None and dead["age_seconds"] >= 0

    lagging = by_key[("cursor", "analytics")]
    assert lagging["floor"] == 0 and lagging["lag"] == 3

    crashed = by_key[("claim", "crashed-lineage")]
    assert crashed["floor"] == 2
    assert crashed["age_seconds"] > 3000  # backdated an hour

    tag = by_key[("tag", "audit")]
    assert tag["floor"] == 1 and tag["age_seconds"] is None

    # a caught-up world: drain + unregister everything, report shrinks
    for _ in range(4):
        df, _, ack = live.next_batch(spark, max_snapshots=1)
        if df is not None:
            df.collect()
        ack()
    assert by_key.keys() >= {("cursor", "abandoned"), ("tag", "audit")}
    caught_up = {
        (r["kind"], r["name"]): r
        for r in retention_report(sink.target_dir, retain_last=1)
    }
    assert caught_up[("cursor", "analytics")]["lag"] == 0
    assert caught_up[("cursor", "analytics")]["extra_kept"] == 0


def test_report_includes_claim_without_data_dir(spark, tmp_path):
    """A writer claims its lane BEFORE any data lands (and
    create_branch reserves a lane the same way), so a crash can leave
    a claim file with NO v=N directory — the report must scan claim
    FILES like recover_interrupted_commit does, not just snapshot
    dirs (round-12 review finding)."""
    sink = _sink_with_history(spark, tmp_path, n_commits=2)
    claim = os.path.join(sink.target_dir, "v=7.claim")
    with open(claim, "w") as f:
        f.write("crashed-before-first-write:5")
    rows = retention_report(sink.target_dir, retain_last=1)
    by_key = {(r["kind"], r["name"]): r for r in rows}
    orphan = by_key[("claim", "crashed-before-first-write")]
    assert orphan["floor"] == 7
    assert orphan["extra_kept"] == 0  # no dir to keep — pure lane block
    assert orphan["age_seconds"] is not None


def test_expire_warns_when_cursor_pin_is_binding(spark, tmp_path, caplog):
    """expire_snapshots must SAY when a cursor floor is the reason
    nothing expires — naming the cursor and its last-touch age — and
    stay quiet when the cursor is caught up."""
    sink = _sink_with_history(spark, tmp_path)
    FeedCursor(sink, str(tmp_path / "dead.cursor"), name="zombie")

    with caplog.at_level(logging.WARNING, "lakehouse_cdc_spark.maintenance"):
        expired = expire_snapshots(sink.target_dir, retain_last=1)
    assert expired == []  # the pin held
    assert any(
        "zombie" in rec.getMessage() and "binding" in rec.getMessage()
        for rec in caplog.records
    )

    # unregister the zombie: expiry proceeds without warning
    caplog.clear()
    refs = sink.refs()
    assert "zombie" in refs["cursors"]

    def _drop(r):
        r["cursors"].pop("zombie")

    sink._refs_update(_drop)
    with caplog.at_level(logging.WARNING, "lakehouse_cdc_spark.maintenance"):
        expired = expire_snapshots(sink.target_dir, retain_last=1)
    assert expired  # history now expires
    assert not caplog.records


def test_cursor_ttl_evicts_abandoned_pin_but_keeps_live_and_legacy(
    spark, tmp_path, caplog
):
    """The Kafka offsets.retention contract: expire_snapshots with
    cursor_ttl_seconds unregisters cursors whose last touch is older
    than the TTL (retention then proceeds), keeps a fresh cursor's
    pin, and NEVER evicts a legacy registration with no timestamp —
    unknown age is not proof of abandonment."""
    sink = _sink_with_history(spark, tmp_path)  # snapshots 0..3

    FeedCursor(sink, str(tmp_path / "a.cursor"), name="abandoned")
    FeedCursor(sink, str(tmp_path / "f.cursor"), name="fresh")

    def _age_and_legacy(refs):
        refs["cursors_meta"]["abandoned"] = time.time() - 7200  # 2h old
        refs["cursors"]["legacy"] = -1  # registered pre-cursors_meta
        refs["cursors_meta"].pop("legacy", None)

    sink._refs_update(_age_and_legacy)

    with caplog.at_level(logging.WARNING, "lakehouse_cdc_spark.maintenance"):
        expired = expire_snapshots(
            sink.target_dir, retain_last=1, cursor_ttl_seconds=3600
        )
    refs = sink.refs()
    assert "abandoned" not in refs["cursors"]  # evicted
    assert "fresh" in refs["cursors"]  # age ~0, survives
    assert "legacy" in refs["cursors"]  # no timestamp: never evicted
    assert expired == []  # fresh + legacy floors (-1) still pin all
    msgs = [r.getMessage() for r in caplog.records]
    assert any("evicted cursor 'abandoned'" in m for m in msgs)
    assert any("legacy" in m and "no last-touch" in m for m in msgs)

    # drop the remaining pins: eviction + retention then reclaims
    def _drop_rest(refs):
        refs["cursors"].pop("legacy")
        refs["cursors"].pop("fresh")
        refs["cursors_meta"].pop("fresh", None)

    sink._refs_update(_drop_rest)
    assert expire_snapshots(sink.target_dir, retain_last=1)


def test_ref_names_with_colon_are_rejected(spark, tmp_path):
    """Round-12 ADVICE: a branch/tag name containing ':' (which covers
    '@wap:') would misparse the ':'-delimited claim-owner protocol —
    create_branch/create_tag must refuse such names up front."""
    import pytest

    sink = _sink_with_history(spark, tmp_path, n_commits=1)
    for bad in ("a:b", "x@wap:y", "", "a/b"):
        with pytest.raises(ValueError):
            sink.create_tag(bad, snapshot=0)
        with pytest.raises(ValueError):
            sink.create_branch(bad)
    # sane names still work
    sink.create_tag("ok-tag", snapshot=0)
    sink.create_branch("ok-branch")
    sink.abort_branch("ok-branch")

"""Checkpointed consumption of the change data feed.

``changes_between`` is a stateless range read; real consumers need a
CURSOR — "give me everything committed since I last acknowledged, and
survive my own crashes".  :class:`FeedCursor` is that contract, the
same shape as a Kafka consumer group offset or a Delta CDF streaming
checkpoint, built on the sink's own commit fence:

- the cursor file stores the last ACKNOWLEDGED snapshot (atomic
  write-then-rename, like every pointer in this engine);
- ``next_batch`` returns the feed for ``(acked, committed]`` plus an
  ``ack`` callback; calling ``ack()`` AFTER the consumer durably
  lands its output makes delivery exactly-once end-to-end — a crash
  before ack replays the same range (idempotent downstream upserts
  absorb it), a crash after ack never re-reads it;
- ranges respect ``MAX_COW_DIFFS`` chunking automatically: a consumer
  that fell far behind catches up in bounded-plan chunks instead of
  one degenerate plan.

The deliberate NON-design: tailing the sink's ``__delta`` dirs with a
file readStream would stream UNCOMMITTED files (a crashed batch's
data lands before the manifest swap publishes it) — phantom changes.
The cursor reads only through ``changes_between``, which resolves
every range against committed manifests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class FeedCursor:
    """Durable, exactly-once cursor over a sink's change feed."""

    def __init__(self, sink, cursor_path: str):
        self.sink = sink
        self.cursor_path = cursor_path
        os.makedirs(os.path.dirname(cursor_path) or ".", exist_ok=True)

    def acked(self) -> int:
        """Last acknowledged snapshot (-1 = nothing consumed yet)."""
        try:
            with open(self.cursor_path) as f:
                return int(json.load(f)["acked"])
        except FileNotFoundError:
            return -1

    def _write(self, snapshot: int) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"acked": snapshot}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.cursor_path)

    def next_batch(
        self, spark: SparkSession, max_snapshots: int | None = None
    ) -> tuple[DataFrame | None, int, object]:
        """The unconsumed feed and the means to acknowledge it.

        Returns ``(df, to_snap, ack)``: ``df`` is the feed for
        ``(acked, to_snap]`` (None when nothing is pending), and
        ``ack()`` durably advances the cursor to ``to_snap`` — call it
        only after the consumer's own output is durable.  ``to_snap``
        is capped at ``acked + max_snapshots`` (default: the sink's
        ``MAX_COW_DIFFS``) so a far-behind consumer catches up in
        bounded-plan chunks; loop until ``df`` is None to drain."""
        if max_snapshots is not None and max_snapshots <= 0:
            raise ValueError(
                f"max_snapshots must be positive, got {max_snapshots}"
            )
        cap = (
            max_snapshots
            if max_snapshots is not None
            else self.sink.MAX_COW_DIFFS
        )
        while True:
            start = self.acked()
            committed = self.sink.committed_snapshot()
            if committed is not None and committed < start:
                # the sink was ROLLED BACK below the cursor: feed
                # history has diverged from what was acknowledged, and
                # silently waiting for the snapshot counter to catch up
                # would skip every change recommitted under
                # already-acked numbers.  Exactly-once cannot be
                # auto-repaired here — the operator must decide whether
                # to reset the cursor (redeliver) or discard consumer
                # state.  Detection is only possible while committed <
                # acked, hence the loud stop.
                raise ValueError(
                    f"sink rolled back below the cursor (committed="
                    f"{committed} < acked={start}): feed history "
                    "diverged — reset the cursor file explicitly"
                )
            if committed is None or committed <= start:
                return None, start, lambda: None
            to_snap = min(committed, start + cap)
            df = self.sink.changes_between(spark, start, to_snap)
            if df is None:
                # the chunk holds only feed-silent commits (folds,
                # watermark-only, compaction): nothing to deliver, so
                # advancing the cursor NOW is trivially exactly-once —
                # and necessary: returning None here would be
                # indistinguishable from "caught up" and a consumer
                # following the drain-until-None protocol would stall
                # on this range forever while real changes pile up
                # beyond it.  Same move-backwards guard as ack(): a
                # zombie consumer that lost a race to its replacement
                # must not rewind the cursor and mass-redeliver.
                if to_snap > self.acked():
                    self._write(to_snap)
                continue

            def ack(to_snap=to_snap):
                cur = self.acked()
                if to_snap < cur:
                    raise ValueError(
                        f"cursor would move backwards: acked={cur}, "
                        f"ack({to_snap}) — stale batch acknowledged twice?"
                    )
                self._write(to_snap)

            return df, to_snap, ack

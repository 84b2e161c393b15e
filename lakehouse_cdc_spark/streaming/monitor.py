"""Stream monitoring (SURVEY T8).

The reference scrapes Debezium's REST metrics and hand-matches event
times across systems (validation.py:439-504,506-618).  Structured
Streaming exposes the same signals natively on the query object; these
helpers normalize them, and table-side freshness comes from
``quality.validation.freshness_lag`` (pure aggregation, no collect).
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def query_progress(query: StreamingQuery) -> dict:
    """Normalized snapshot of the last micro-batch's health: rows/sec,
    batch duration, state size, watermark — the replication-lag
    dashboard the reference built by polling connector REST metrics."""
    p = query.lastProgress
    if p is None:
        return {"batch_id": None, "alive": query.isActive}
    state = (p.get("stateOperators") or [{}])[0]
    return {
        "batch_id": p.get("batchId"),
        "alive": query.isActive,
        "input_rows": p.get("numInputRows"),
        "rows_per_sec": p.get("processedRowsPerSecond"),
        "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        "state_rows": state.get("numRowsTotal"),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


def lag_alert(progress: dict, max_batch_ms: int = 60_000) -> bool:
    """The reference's <60 s replication-lag gate
    (validation.py:483) applied to micro-batch duration."""
    d = progress.get("batch_duration_ms")
    return d is not None and d > max_batch_ms


class ProgressHistoryListener:
    """PUSH-based stream monitoring (``StreamingQueryListener``): the
    session calls back on query start / per-batch progress / idle /
    termination, so an operations dashboard sees every micro-batch —
    the pull-based :func:`query_progress` only samples whatever batch
    happens to be last when polled.  Records a bounded history and
    applies the reference's <60 s lag gate (validation.py:483) to
    every batch as it commits.

    Subclassing is deferred to :func:`attach_progress_listener` so
    importing this module never hard-requires the streaming listener
    machinery.
    """

    def __init__(self, max_batch_ms: int = 60_000, keep: int = 1000):
        self.max_batch_ms = max_batch_ms
        self.keep = keep
        self.started: list[str] = []
        self.progresses: list[dict] = []
        self.terminated: list[str] = []
        self.alerts: list[dict] = []

    def record_start(self, qid: str) -> None:
        self.started.append(qid)

    def record_progress(self, p) -> None:
        d = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "input_rows": p.numInputRows,
            "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            # per-batch df.observe() counters (free in-pass validation)
            "observed": {
                k: v.asDict() if hasattr(v, "asDict") else dict(v)
                for k, v in (p.observedMetrics or {}).items()
            },
        }
        self.progresses.append(d)
        del self.progresses[: -self.keep]
        if d["duration_ms"] is not None and d["duration_ms"] > self.max_batch_ms:
            self.alerts.append(d)
            del self.alerts[: -self.keep]  # same bound as progresses

    def record_stop(self, qid: str) -> None:
        self.terminated.append(qid)

    def total_input_rows(self) -> int:
        return sum(p["input_rows"] or 0 for p in self.progresses)


def attach_progress_listener(spark, history: ProgressHistoryListener):
    """Wrap ``history`` in a ``StreamingQueryListener`` and register
    it on the session.  Returns the listener handle — pass it to
    ``spark.streams.removeListener`` when done (tests MUST, or the
    shared session leaks callbacks)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            history.record_start(str(event.id))

        def onQueryProgress(self, event):
            history.record_progress(event.progress)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            history.record_stop(str(event.id))

    listener = _L()
    spark.streams.addListener(listener)
    return listener

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

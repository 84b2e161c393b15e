"""Event-time operators (SURVEY T7's missing half).

The reference is processing-time-only (``datetime.now()``,
spark_batch.py:221) — no watermarks, no event-time windows.  These
helpers add the event-time family; each works identically on batch and
streaming DataFrames, so the batch form is oracle-checkable while the
streaming form is tested by replaying the same data as a stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermark_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Late-tolerant exactly-once-per-key dedup with BOUNDED state.

    Uses ``dropDuplicatesWithinWatermark``: a key's dedup state is
    evicted once the watermark passes it, so the state store is
    bounded by the watermark window — plain ``dropDuplicates(keys)``
    under a watermark keeps one entry per ever-seen key forever (the
    watermark only evicts state when the event-time column is part of
    the dedup key).  Semantics: duplicates arriving within ``delay``
    of each other are dropped; a re-delivery later than the watermark
    window is treated as new (at-least-once downstream, which the
    idempotent MERGE absorbs).  Batch DataFrames fall back to plain
    dropDuplicates (no state to bound)."""
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def tumbling_window_agg(
    df: DataFrame,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    ts_col: str = "ts",
    delay: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation (T7)."""
    if delay is not None:
        df = df.withWatermark(ts_col, delay)
    return df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    ts_col: str = "ts",
    delay: str | None = None,
) -> DataFrame:
    """Sliding event-time window aggregation."""
    if delay is not None:
        df = df.withWatermark(ts_col, delay)
    return df.groupBy(
        F.window(ts_col, duration, slide).alias("w"), *group_cols
    ).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    ts_col: str = "ts",
    delay: str | None = None,
) -> DataFrame:
    """Session windows (gap-based) — sessionization of the event
    stream."""
    if delay is not None:
        df = df.withWatermark(ts_col, delay)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), *group_cols
    ).agg(*aggs)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback: str = "INTERVAL 1 HOUR",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each left event matches right
    events with the same key in ``(left_ts - lookback, left_ts]``.

    Spark can join two STREAMS only because the time bound + watermark
    make the buffered state finite: each side keeps rows until the
    other side's watermark passes the interval, then evicts — state is
    O(rate × (watermark + lookback)), independent of stream age.  An
    unbounded-condition stream-stream join is rejected by Spark for
    exactly that reason; the interval is what makes the operator
    shippable at 100 TB/day.  The right side's columns are prefixed
    ``r_`` to keep the joined schema unambiguous.  Works identically
    on batch frames (watermarks are no-ops there), so batch≡stream
    equivalence is testable.

    ``how="left_outer"`` adds the null-padded unmatched-left rows —
    emitted only once the watermark proves no future right row can
    still match (i.e. null results trail by watermark + lookback;
    the standard outer-join latency, not a bug).  Outer joins REQUIRE
    the watermark + time-bound state eviction above — Spark rejects
    an outer stream-stream join without them.
    """
    r = right.select(
        *[F.col(c).alias(f"r_{c}" if not c.startswith("r_") else c) for c in right.columns]
    )
    r_key = f"r_{on}" if not on.startswith("r_") else on
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    cond = (
        (F.col(on) == F.col(r_key))
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) > F.expr(f"{left_ts} - {lookback}"))
    )
    return left.join(r, cond, how)

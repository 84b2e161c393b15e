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

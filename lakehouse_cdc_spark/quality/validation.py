"""Source-vs-target validation as distributed operators.

Reference behaviors re-expressed (citations into /root/reference/):

- row-count equality within tolerance  (validation.py:209-258, 0.1%)
- missing/extra keys                   (validation.py:389-410 — was a
  per-key ``collect()`` probe loop; here one anti-join)
- sample match rate                    (validation.py:329-437, ≥99% —
  was ORDER BY RANDOM(); here a deterministic hash sample so results
  are reproducible)
- freshness / end-to-end lag           (validation.py:506-618 — was
  Python set-intersection + driver math; here pure aggregation)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.joins import anti_join, equi_join


def row_count_diff(
    source: DataFrame, target: DataFrame, tolerance: float = 0.001
) -> DataFrame:
    """One-row verdict: counts, relative difference, within-tolerance
    flag (0.1% default, validation.py:236).

    Empty source vs non-empty target is a total mismatch (diff_pct
    1.0), not a vacuous pass — only empty-vs-empty reports 0.0."""
    s = source.agg(F.count(F.lit(1)).alias("source_cnt"))
    t = target.agg(F.count(F.lit(1)).alias("target_cnt"))
    return (
        s.crossJoin(t)
        .withColumn(
            "diff_pct",
            F.when(
                F.col("source_cnt") == 0,
                F.when(F.col("target_cnt") == 0, F.lit(0.0)).otherwise(F.lit(1.0)),
            ).otherwise(
                F.abs(F.col("source_cnt") - F.col("target_cnt"))
                / F.col("source_cnt").cast("double")
            ),
        )
        .withColumn("within_tolerance", F.col("diff_pct") <= tolerance)
    )


def missing_keys(source: DataFrame, target: DataFrame, keys: list[str]) -> DataFrame:
    """Keys present in source but absent from target — one anti-join
    instead of N driver round-trips (validation.py:389-410)."""
    return anti_join(source.select(*keys), target.select(*keys), on=keys)


def sample_match_rate(
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    modulus: int = 50,
    sample_pred=None,
) -> DataFrame:
    """Deterministic sample comparison: take every key whose hash ≡ 0
    (mod ``modulus``) from source (or rows matching ``sample_pred``),
    inner-join target, compare columns.  Returns one row (sampled,
    matched, match_rate) — the ≥99% check of validation.py:419,
    reproducible instead of ORDER BY RANDOM().

    The rate is per *sampled source row*: duplicate keys in the target
    would otherwise fan the join out and count one source row several
    times, so the comparison aggregates per key first (a key matches
    iff every duplicate target row for it matches)."""
    if sample_pred is None:
        sample_pred = F.abs(F.hash(*[F.col(k) for k in keys])) % modulus == 0
    sample = source.filter(sample_pred)
    joined = equi_join(
        sample.select(*keys, *[F.col(c).alias(f"s_{c}") for c in compare_cols]),
        target.select(*keys, *[F.col(c).alias(f"t_{c}") for c in compare_cols]),
        on=keys,
        how="left",
    )
    row_match = F.lit(True)
    for c in compare_cols:
        row_match = row_match & (F.col(f"s_{c}").eqNullSafe(F.col(f"t_{c}")))
    # collapse target-side duplicates: one verdict per sampled key
    per_key = joined.groupBy(*keys).agg(F.min(row_match.cast("long")).alias("key_match"))
    match = F.col("key_match") == 1
    return per_key.agg(
        F.count(F.lit(1)).alias("sampled"),
        F.sum(match.cast("long")).alias("matched"),
        (
            F.sum(match.cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("match_rate"),
    )


def freshness_check(
    source: DataFrame, target: DataFrame, ts_col: str, max_lag_s: int = 0
) -> DataFrame:
    """Is the target's newest ``ts_col`` within ``max_lag_s`` of the
    source's?  One row: (source_max_ts, target_max_ts, lag_s,
    is_fresh) — the source-vs-target half of the reference's
    check_data_freshness (validation.py:506-560) without driver math."""
    s = source.agg(F.max(F.col(ts_col).cast("timestamp")).alias("source_max_ts"))
    t = target.agg(F.max(F.col(ts_col).cast("timestamp")).alias("target_max_ts"))
    return (
        s.crossJoin(t)
        .withColumn(
            "lag_s",
            F.col("source_max_ts").cast("long") - F.col("target_max_ts").cast("long"),
        )
        .withColumn("is_fresh", F.coalesce(F.col("lag_s") <= max_lag_s, F.lit(False)))
    )


def run_suite(
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    ts_col: str | None = None,
    tolerance: float = 0.001,
    min_match_rate: float = 0.99,
    sample_pred=None,
    max_missing: int = 0,
    max_lag_s: int = 0,
) -> DataFrame:
    """The validation-suite runner (reference validation.py:834-937):
    run every source-vs-target check, count passes, grade the outcome
    ``Good`` (≥95%), ``Warning`` (≥80%) or ``Poor``.

    Composition, not a driver loop: each check is a one-row aggregate
    DataFrame; they cross-join into a single row with per-check
    booleans + ``success_rate`` + ``overall_status``, so the whole
    suite is ONE Spark job of parallel scalar aggregates — nothing is
    collected, and the suite result is itself a DataFrame (writable,
    oracle-checkable).

    Checks (reference mapping):
      row_count_ok  — validate_row_count, ±tolerance
      sampling_ok   — sample_data_validation, ≥ min_match_rate
      missing_ok    — missing/extra-keys probe, ≤ max_missing absent
      nullkeys_ok   — key integrity (no NULL keys in target)
      fresh_ok      — check_data_freshness (only when ts_col given)
    """
    rc = row_count_diff(source, target, tolerance).select(
        F.col("within_tolerance").alias("row_count_ok")
    )
    sm = sample_match_rate(
        source, target, keys, compare_cols, sample_pred=sample_pred
    ).select(
        F.coalesce(F.col("match_rate") >= min_match_rate, F.lit(False)).alias(
            "sampling_ok"
        )
    )
    mk = missing_keys(source, target, keys).agg(
        (F.count(F.lit(1)) <= max_missing).alias("missing_ok")
    )
    null_pred = None
    for k in keys:
        p = F.col(k).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    nk = target.agg(
        (F.sum(null_pred.cast("long")) == 0).alias("nullkeys_ok")
    )
    checks = ["row_count_ok", "sampling_ok", "missing_ok", "nullkeys_ok"]
    row = rc.crossJoin(sm).crossJoin(mk).crossJoin(nk)
    if ts_col is not None:
        fr = freshness_check(source, target, ts_col, max_lag_s).select(
            F.col("is_fresh").alias("fresh_ok")
        )
        row = row.crossJoin(fr)
        checks.append("fresh_ok")
    passed = None
    for c in checks:
        t = F.coalesce(F.col(c), F.lit(False)).cast("int")
        passed = t if passed is None else (passed + t)
    rate = passed.cast("double") * 100.0 / float(len(checks))
    return row.select(
        *checks,
        F.lit(len(checks)).alias("n_checks"),
        passed.alias("n_passed"),
        rate.alias("success_rate"),
        F.when(rate >= 95.0, "Good")
        .when(rate >= 80.0, "Warning")
        .otherwise("Poor")
        .alias("overall_status"),
    )


def freshness_lag(df: DataFrame, ts_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Lag of each group's newest event behind the table's newest event
    (seconds) — the end-to-end lag measure of validation.py:506-618
    without collecting rows to the driver."""
    global_max = df.agg(F.max(ts_col).alias("global_max"))
    per_group = df.groupBy(*(group_cols or [])).agg(F.max(ts_col).alias("group_max"))
    return per_group.crossJoin(F.broadcast(global_max)).select(
        *(group_cols or []),
        (
            F.col("global_max").cast("long") - F.col("group_max").cast("long")
        ).alias("lag_s"),
    )


def observe_quality(
    df: DataFrame, null_check_cols: list[str], name: str = "quality"
):
    """Piggyback data-quality counters on a query via ``observe()`` —
    row count + per-column null counts computed IN THE SAME PASS as
    whatever the caller does with the returned DataFrame (write, join,
    aggregate).  At 100 TB this is the difference between free
    validation and a second full scan: the reference runs its
    row-count check as a separate COUNT query
    (validation.py:209-258); Observation folds it into the job that
    already read the data.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action has run on ``df``.  Works on batch frames; for streams use
    ``df.observe(name, *metrics)`` and read per-batch values from
    ``progress.observedMetrics`` (see
    streaming/monitor.ProgressHistoryListener).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in null_check_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs

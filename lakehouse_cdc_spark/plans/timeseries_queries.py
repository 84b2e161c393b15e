"""Time-series declared queries (round 2 wave 7).

Event streams are the reference's bread and butter (CDC over an
`events` firehose); this family adds the time-series post-processing
every observability / feature-engineering pipeline layers on top:

- ``ts_gap_fill_locf`` — resample to a daily grid and carry the last
  observation forward (LOCF interpolation), the canonical prep step
  before windowed feature extraction.
- ``ts_anomaly_zscore`` — rolling z-score anomaly detection over a
  trailing row frame, done in EXACT integer arithmetic so the flags
  are bit-identical across engines (no float stddev drift).
- ``ts_ewma_recursive`` — exponentially-weighted moving average via a
  per-key ``applyInPandas`` recurrence, oracle-checked against a
  DuckDB ``WITH RECURSIVE`` evaluation of the same IEEE ops.

Reference parity: extends the reference's event-stream validation
family (/root/reference/src/validation/validation.py) with the
derived-signal operators its OLTP focus stops short of.

Scale notes (100 TB): the daily grid is |distinct keys| x |days| —
the day spine is a broadcast of a few hundred rows, so the only
shuffle is the per-key daily aggregate; LOCF and the rolling frames
are single-pass window functions partitioned by key (no cross-key
traffic); the EWMA recurrence is inherently sequential PER KEY but
embarrassingly parallel ACROSS keys, which is exactly what
``groupBy(key).applyInPandas`` gives (one Arrow batch per key group,
keys spread over executors).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table

# value has 2 decimal digits in the testdata generator; x100 makes an
# exact BIGINT in both engines (probed: 0 rows where round differs).
_V100 = "CAST(ROUND(value * 100) AS BIGINT)"


@register(
    "ts_gap_fill_locf",
    oracle="""
    WITH e AS (SELECT * FROM events WHERE user_id < 20),
    daily AS (
      SELECT user_id, day, value AS day_value
      FROM (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM e)
      WHERE rn = 1
    ),
    bounds AS (SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
                      CAST(max(date_trunc('day', ts)) AS DATE) AS hi FROM e),
    days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             FROM bounds),
    grid AS (SELECT u.user_id, d.day
             FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN days d)
    SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day, d.day_value,
           last_value(d.day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
           CAST(CASE WHEN d.day_value IS NULL THEN 1 ELSE 0 END AS INT) AS was_filled
    FROM grid g
    LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
    tags=("timeseries", "window", "resample"),
)
def ts_gap_fill_locf(spark, sf_dir):
    """Daily resample + last-observation-carried-forward: each key is
    expanded onto the corpus' full day grid; days with no event carry
    the previous day's LAST observed value (ties broken by event_id).
    The day spine (one row per day) and the key list come from two
    tiny aggregates, so the grid is a broadcast nested-loop — the only
    key-hash shuffle is the daily top-1 compaction, and the LOCF fill
    is one window pass per key.  Values are carried verbatim (no
    arithmetic), so filled rows are bit-identical across engines."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    # daily top-1 as an algebraic argmax (max_by over the tie-broken
    # (ts, event_id) order) — map-side partials instead of shuffling
    # every event to a rank-1 window sort
    daily = (
        e.select("user_id", day.alias("day"), "value", "ts", "event_id")
        .groupBy("user_id", "day")
        .agg(
            F.max_by("value", F.struct("ts", "event_id")).alias("day_value")
        )
    )
    bounds = e.agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("lo"),
        F.to_date(F.max(F.date_trunc("day", "ts"))).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    grid = e.select("user_id").distinct().crossJoin(F.broadcast(days))
    locf = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "day_value",
            F.last("day_value", ignorenulls=True).over(locf).alias("locf_value"),
            F.when(F.col("day_value").isNull(), 1).otherwise(0)
            .cast("int")
            .alias("was_filled"),
        )
    )


@register(
    "ts_anomaly_zscore",
    bench=True,
    oracle=f"""
    WITH scored AS (
      SELECT event_type, {_V100} AS v,
             COUNT(*) OVER w AS n,
             SUM({_V100}) OVER w AS s,
             SUM({_V100} * {_V100}) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE n >= 20) AS BIGINT) AS n_scored,
           CAST(COUNT(*) FILTER (WHERE n >= 20 AND
             (n - 1) * (n * v - s) * (n * v - s) > 4 * n * (n * s2 - s * s)
           ) AS BIGINT) AS n_anomalies_z2,
           CAST(COUNT(*) FILTER (WHERE n >= 20 AND
             (n - 1) * (n * v - s) * (n * v - s) > 9 * n * (n * s2 - s * s)
           ) AS BIGINT) AS n_anomalies_z3
    FROM scored
    GROUP BY event_type
    """,
    tags=("timeseries", "window", "quality"),
)
def ts_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly flags over a trailing 50-row frame per
    event_type, WITHOUT floating-point stddev: with v = value*100 as
    an exact BIGINT, ``|v - mean| > z*stddev`` is algebraically
    equivalent to ``(n-1)(nv - s)^2 > z^2 * n * (n*s2 - s^2)`` over
    the frame sums (s, s2) — pure integer arithmetic, bit-identical in
    any engine (max magnitude ~3e15, well inside int64).

    There are only ~5 event types, so a window partitioned by
    event_type alone runs 5 tasks forever (the r12 sf1 profile's worst
    ratio, 3.03x for 10x data: each task's sort grows super-linearly).
    The frame is bounded (50 trailing rows), so the scorer chunks by
    day with a 50-row carry across bucket boundaries
    (operators/chunked.with_trailing_carry): identical frame contents,
    |event_type| x |days| parallelism, then one tiny groupBy."""
    from lakehouse_cdc_spark.operators.chunked import with_trailing_carry

    aug = with_trailing_carry(
        table(spark, sf_dir, "events").select(
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("v"),
        ),
        key_cols=["event_type"],
        order_cols=["ts", "event_id"],
        max_preceding=50,
        bucket=F.date_trunc("day", F.col("ts")),
    )
    w = (
        Window.partitionBy("event_type", "__b")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    scored = aug.select(
        "event_type",
        "v",
        "__carry",
        F.count("v").over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("s2"),
    ).filter(F.col("__carry") == 0)
    # explicit bigint self-multiply: Column ** 2 compiles to pow() and
    # silently promotes the whole comparison to DOUBLE
    d = F.col("n") * F.col("v") - F.col("s")
    dev2 = (F.col("n") - 1) * d * d
    spread = F.col("n") * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
    warm = F.col("n") >= 20
    return scored.groupBy("event_type").agg(
        F.count(F.when(warm, 1)).alias("n_scored"),
        F.count(F.when(warm & (dev2 > 4 * spread), 1)).alias("n_anomalies_z2"),
        F.count(F.when(warm & (dev2 > 9 * spread), 1)).alias("n_anomalies_z3"),
    )


_EWMA_SCHEMA = "user_id bigint, n_events bigint, ewma double"


def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-key EWMA recurrence y = 0.5*x + 0.5*y in plain IEEE-double
    ops (two mults + one add per step, same sequence the oracle's
    recursive CTE evaluates → bit-identical results)."""
    pdf = pdf.sort_values(["ts", "event_id"])
    y = None
    for x in pdf["value"]:
        x = float(x)
        y = x if y is None else 0.5 * x + 0.5 * y
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n_events": [len(pdf)], "ewma": [y]}
    )


@register(
    "ts_ewma_recursive",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, CAST(value AS DOUBLE) AS value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 10
    ),
    r AS (
      SELECT user_id, rn, value AS ewma FROM ev WHERE rn = 1
      UNION ALL
      SELECT ev.user_id, ev.rn, 0.5 * ev.value + 0.5 * r.ewma
      FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
    )
    SELECT user_id, CAST(rn AS BIGINT) AS n_events, ewma
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rr
          FROM r)
    WHERE rr = 1
    """,
    tags=("timeseries", "pandas-udf", "stateful"),
)
def ts_ewma_recursive(spark, sf_dir):
    """Exponentially-weighted moving average (alpha = 0.5) — the
    canonical operator SQL window frames CANNOT express (every output
    depends on the full prefix with geometric weights).  Implemented
    as the idiomatic Spark escape hatch: ``groupBy(key).applyInPandas``
    — sequential per key, parallel across keys, one Arrow batch per
    group, no driver involvement.  The oracle replays the identical
    IEEE recurrence with a recursive CTE; because both sides execute
    the same two-mult-one-add sequence per step, the doubles match
    bit-for-bit (alpha = 0.5 keeps every halving exact)."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", "ts", "event_id", "value")
    )
    return e.groupBy("user_id").applyInPandas(_ewma_group, _EWMA_SCHEMA)


@register(
    "ts_breakout_channel",
    oracle=f"""
    WITH base AS (
      SELECT event_type, ts, event_id, {_V100} AS v FROM events
    ),
    ch AS (
      SELECT event_type, event_id, v,
             MAX(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
               AS hi,
             MIN(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
               AS lo
      FROM base
    )
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE v > hi) AS BIGINT) AS n_up,
           CAST(COUNT(*) FILTER (WHERE v < lo) AS BIGINT) AS n_down,
           CAST(SUM(event_id) FILTER (WHERE v > hi OR v < lo) AS BIGINT)
             AS sum_breakout_ids
    FROM ch GROUP BY event_type ORDER BY event_type
    """,
    tags=("timeseries", "window", "anomaly", "channel"),
)
def ts_breakout_channel(spark, sf_dir):
    """DONCHIAN CHANNEL BREAKOUTS: an observation breaking above the
    rolling 20-observation high (or below the rolling low) of its own
    series — the classic channel/regime-change detector (and the
    windowed complement of ts_mad_anomalies' global robust-z).
    Bounded-frame window aggregates with exact integer cents, so the
    strict > / < comparisons are engine-identical (the (ts, event_id)
    order key makes duplicate timestamps deterministic).

    Like ts_anomaly_zscore, the ~5-value series key would cap the
    window at 5-task parallelism forever; the 20-row trailing frame
    chunks by day with a 20-row carry
    (operators/chunked.with_trailing_carry) for |series| x |days|
    parallelism with identical frame contents."""
    from lakehouse_cdc_spark.operators.chunked import with_trailing_carry

    e = table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("bigint")
    aug = with_trailing_carry(
        e.select("event_type", "ts", "event_id", v.alias("v")),
        key_cols=["event_type"],
        order_cols=["ts", "event_id"],
        max_preceding=20,
        bucket=F.date_trunc("day", F.col("ts")),
    )
    w = Window.partitionBy("event_type", "__b").orderBy("ts", "event_id")
    ch = aug.select(
        "event_type",
        "event_id",
        "v",
        "__carry",
        F.max("v").over(w.rowsBetween(-20, -1)).alias("hi"),
        F.min("v").over(w.rowsBetween(-20, -1)).alias("lo"),
    ).filter(F.col("__carry") == 0)
    up = F.col("v") > F.col("hi")
    down = F.col("v") < F.col("lo")
    return (
        ch.groupBy("event_type")
        .agg(
            F.count_if(up).cast("bigint").alias("n_up"),
            F.count_if(down).cast("bigint").alias("n_down"),
            F.sum(F.when(up | down, F.col("event_id")))
            .cast("bigint")
            .alias("sum_breakout_ids"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_downsample_ohlc",
    bench=True,
    oracle=f"""
    WITH base AS (
      SELECT event_type, strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d')
               AS day,
             {_V100} AS v, ts, event_id
      FROM events
    ),
    ranked AS (
      SELECT event_type, day, v,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY ts ASC, event_id ASC) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM base
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn_open = 1 THEN v END) AS open_c,
           MAX(v) AS high_c,
           MIN(v) AS low_c,
           MAX(CASE WHEN rn_close = 1 THEN v END) AS close_c,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ranked
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    tags=("timeseries", "downsample", "ohlc", "W1-scale"),
)
def ts_downsample_ohlc(spark, sf_dir):
    """OHLC down-sampling (the canonical lossy time-series compaction:
    candlestick open/high/low/close + volume per (series, day)).  Open
    and close are the values at the MIN / MAX of the TOTAL order
    (ts, event_id — ties broken), so the result is
    partition-invariant; values ride the x100 fixed-point BIGINT, so
    all five outputs are exact integer selections both engines agree
    on.

    Pure ONE-PASS aggregation (min_by/max_by over the order struct) —
    the previous form ranked every row with two opposite-order
    row_number windows and shuffled the WHOLE event stream to them;
    min_by/max_by are algebraic, so each map task reduces its rows to
    one partial per (series, day) and only |series| x |days| partials
    cross the exchange (guide §2.2: aggregate before you shuffle;
    measured 1.34x at sf0.1, rows identical).  At 100 TB the output is
    |series| x |days| rows, a ~10^5x reduction that makes downstream
    dashboard scans interactive — and the shuffle now carries that
    same reduced volume instead of the corpus."""
    base = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.expr(_V100).alias("v"),
        "ts",
        "event_id",
    )
    order = F.struct("ts", "event_id")
    return (
        base.groupBy("event_type", "day")
        .agg(
            F.min_by("v", order).alias("open_c"),
            F.max("v").alias("high_c"),
            F.min("v").alias("low_c"),
            F.max_by("v", order).alias("close_c"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "ts_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM({_V100}) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, SUM(s) AS st, SUM(n) AS nt
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day,
             d.s * t.nt - t.st * d.n AS c
      FROM daily d JOIN tot t ON d.event_type = t.event_type
    ),
    cusum AS (
      SELECT event_type, day,
             SUM(c) OVER (PARTITION BY event_type ORDER BY day) AS cum
      FROM dev
    ),
    peak AS (
      SELECT event_type, day AS change_day, cum,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(cum) DESC, day ASC) AS rn
      FROM cusum
    )
    SELECT event_type, change_day,
           CAST(abs(cum) AS BIGINT) AS cusum_peak,
           CAST(CASE WHEN cum > 0 THEN 1 WHEN cum < 0 THEN -1 ELSE 0 END
                AS INT) AS direction
    FROM peak WHERE rn = 1
    ORDER BY event_type
    """,
    tags=("timeseries", "changepoint", "cusum", "W1"),
)
def ts_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection per event series: the day where
    the cumulative deviation from the series' global mean peaks is the
    most likely mean-shift location (Page 1954).  All arithmetic stays
    EXACT integer by clearing denominators — the daily deviation is
    s_day*N - S*n_day (both sides of mean_day - mean_global scaled by
    n_day*N), so the cumulative sum, the peak, and its sign are
    bit-identical in both engines with no float drift over long
    accumulations.  Shape: one (type, day) aggregate (map-side
    combined), a broadcast of |types| totals, a per-type window
    cumsum, and an argmax — nothing touches raw rows twice, and the
    windows partition by series, so state per task is |days|."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.sum(F.expr(_V100)).cast("bigint").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt")
    )
    dev = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        (F.col("s") * F.col("nt") - F.col("st") * F.col("n")).alias("c"),
    )
    w_cum = Window.partitionBy("event_type").orderBy("day")
    cusum = dev.select(
        "event_type", "day", F.sum("c").over(w_cum).alias("cum")
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cum")).desc(), F.asc("day")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_peak))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.abs(F.col("cum")).alias("cusum_peak"),
            F.when(F.col("cum") > 0, 1)
            .when(F.col("cum") < 0, -1)
            .otherwise(0)
            .cast("int")
            .alias("direction"),
        )
        .orderBy("event_type")
    )


_ACF_LAGS = (1, 2, 3, 7)


@register(
    "ts_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d,
             CAST(SUM({_V100}) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s
      FROM daily GROUP BY event_type
    ),
    centered AS (
      SELECT d.event_type, d.d, t.n,
             CAST(d.x AS HUGEINT) * t.n - t.s AS c
      FROM daily d JOIN tot t ON d.event_type = t.event_type
    ),
    den AS (
      SELECT event_type, SUM(c * c) AS den
      FROM centered GROUP BY event_type
    ),
    lags AS (SELECT unnest(ARRAY{list(_ACF_LAGS)}) AS lag),
    num AS (
      SELECT a.event_type, l.lag, SUM(a.c * b.c) AS num
      FROM centered a
      JOIN lags l ON TRUE
      JOIN centered b ON b.event_type = a.event_type AND b.d = a.d + l.lag
      GROUP BY a.event_type, l.lag
    )
    SELECT n.event_type, n.lag,
           CAST(n.num AS VARCHAR) AS num,
           CAST(d.den AS VARCHAR) AS den,
           round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6) AS acf
    FROM num n JOIN den d ON n.event_type = d.event_type
    ORDER BY n.event_type, n.lag
    """,
    tags=("timeseries", "autocorrelation", "seasonality", "W1"),
)
def ts_autocorrelation(spark, sf_dir):
    """Autocorrelation of daily series values at lags 1/2/3/7 — the
    seasonality probe (a weekly cycle surfaces as an acf(7) spike)
    run before choosing forecast features.  Denominators are cleared
    the CUSUM way: centered terms become n*x_d - S (exact bigints), so
    numerator and denominator are integer dot products and the
    biased-ACF ratio is derived exactly, rounded once at the end.
    The centered terms and both dot products accumulate in
    DECIMAL(38,0)/HUGEINT and the numerators are EMITTED as digit
    strings — valid until a dot product passes 1e38, four orders past
    a 100 TB deployment's worst case (the int64 version cliffs at
    2^63, within 10x of real daily volumes — same fix as
    stats_correlation_matrix).  Shape: the daily table is tiny
    (|types| x |days|); lag
    joins and both dot products run over it, never over raw events."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "datediff(to_date(date_trunc('day', ts)), DATE '2024-01-01')"
            ).alias("d"),
        )
        .agg(F.sum(F.expr(_V100)).cast("bigint").alias("x"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    centered = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        (
            F.col("x").cast("decimal(38,0)") * F.col("n") - F.col("s")
        ).alias("c"),
    )
    den = centered.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).alias("den")
    )
    lags = spark.createDataFrame([(k,) for k in _ACF_LAGS], "lag long")
    a = centered.alias("a")
    b = centered.select(
        F.col("event_type").alias("event_type_b"),
        F.col("d").alias("d_b"),
        F.col("c").alias("c_b"),
    )
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("event_type") == F.col("event_type_b"))
            & (F.col("d_b") == F.col("d") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("c") * F.col("c_b")).alias("num"))
    )
    return (
        num.join(den, "event_type")
        .select(
            "event_type",
            "lag",
            F.col("num").cast("decimal(38,0)").cast("string").alias("num"),
            F.col("den").cast("decimal(38,0)").cast("string").alias("den"),
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


_WMA_W = [1, 2, 3, 4, 5, 6, 7]  # ascending recency weights, sum 28


@register(
    "ts_weighted_moving_average",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d,
             CAST(SUM({_V100}) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, d, x,
             {", ".join(f"LAG(x, {k}) OVER (PARTITION BY event_type ORDER BY d) AS x{k}" for k in range(1, 7))}
      FROM daily
    )
    SELECT event_type, d, x,
           {" + ".join(f"{_WMA_W[6 - k]} * x{k}" if k else f"{_WMA_W[6]} * x" for k in range(7))}
             AS wma_num,
           CAST(28 AS BIGINT) AS wma_den,
           round(({" + ".join(f"{_WMA_W[6 - k]} * x{k}" if k else f"{_WMA_W[6]} * x" for k in range(7))})
                 / 28.0, 4) AS wma
    FROM lagged
    WHERE x6 IS NOT NULL
    ORDER BY event_type, d
    """,
    tags=("timeseries", "wma", "smoothing", "W1"),
)
def ts_weighted_moving_average(spark, sf_dir):
    """Linearly-weighted moving average (weights 1..7 over the
    trailing week, newest heaviest) — the finite-window smoother next
    to the EWMA recurrence: no per-key sequential state, just 6 lag()
    taps sharing one window partitioning, so it vectorizes where EWMA
    must run a kernel.  Numerator and denominator are exact integers
    (the rounded ratio is derived once at the end); rows before a full
    window are excluded rather than partially weighted, which is the
    bias-free convention.  One (series)-keyed shuffle total."""
    from pyspark.sql import Window

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "datediff(to_date(date_trunc('day', ts)), DATE '2024-01-01')"
            ).alias("d"),
        )
        .agg(F.sum(F.expr(_V100)).cast("bigint").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "d",
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, 7)],
    )
    num = sum(
        (F.col(f"x{k}") if k else F.col("x")) * _WMA_W[6 - k] for k in range(7)
    )
    return (
        lagged.filter(F.col("x6").isNotNull())
        .select(
            "event_type",
            "d",
            "x",
            num.alias("wma_num"),
            F.lit(28).cast("bigint").alias("wma_den"),
            F.round(num / 28.0, 4).alias("wma"),
        )
        .orderBy("event_type", "d")
    )


@register(
    "ts_mad_anomalies",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d,
             CAST(SUM({_V100}) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    med AS (
      -- discrete median by rank over the per-series daily values
      SELECT event_type, x AS m FROM (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily) WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT d.event_type, d.d, d.x, m.m, abs(d.x - m.m) AS ad
      FROM daily d JOIN med m ON d.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, ad AS mad FROM (
        SELECT event_type, ad,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev) WHERE rn = (n + 1) // 2
    )
    SELECT v.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           MAX(v.m) AS median_cents,
           MAX(md.mad) AS mad_cents,
           CAST(COUNT(*) FILTER (WHERE v.ad > 3 * md.mad) AS BIGINT)
             AS n_anomalies_3mad,
           CAST(COUNT(*) FILTER (WHERE v.ad > 5 * md.mad) AS BIGINT)
             AS n_anomalies_5mad
    FROM dev v JOIN mad md ON v.event_type = md.event_type
    GROUP BY v.event_type
    ORDER BY v.event_type
    """,
    tags=("timeseries", "mad", "robust", "anomaly", "W1"),
)
def ts_mad_anomalies(spark, sf_dir):
    """Robust (MAD) anomaly detection per daily series — the
    breakdown-resistant twin of ts_anomaly_zscore: the z-score's mean
    and stddev are themselves dragged by the outliers they hunt, while
    median and median-absolute-deviation tolerate up to 50%
    contamination.  Both medians come from discrete rank selection
    ((n+1) div 2) over the tiny per-series daily table, deviations
    and thresholds stay exact integers (3*MAD / 5*MAD comparisons
    need no float), so the anomaly counts are engine-identical.
    Nothing here touches raw events twice: one daily aggregate, two
    rank picks, one counting pass."""
    from pyspark.sql import Window

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "datediff(to_date(date_trunc('day', ts)), DATE '2024-01-01')"
            ).alias("d"),
        )
        .agg(F.sum(F.expr(_V100)).cast("bigint").alias("x"))
        # two rank picks + the counting pass read the daily aggregate;
        # materialized once per invocation (localCheckpoint)
        .localCheckpoint()
    )

    def rank_pick(df, col, out):
        w = Window.partitionBy("event_type").orderBy(col)
        wn = Window.partitionBy("event_type")
        return (
            df.select(
                "event_type",
                col,
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wn).alias("n"),
            )
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = rank_pick(daily, "x", "m")
    dev = daily.join(med, "event_type").withColumn(
        "ad", F.abs(F.col("x") - F.col("m"))
    )
    mad = rank_pick(dev, "ad", "mad")
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max("m").alias("median_cents"),
            F.max("mad").alias("mad_cents"),
            F.count(F.when(F.col("ad") > 3 * F.col("mad"), 1)).alias(
                "n_anomalies_3mad"
            ),
            F.count(F.when(F.col("ad") > 5 * F.col("mad"), 1)).alias(
                "n_anomalies_5mad"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "ts_seasonal_dow_profile",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_V100}) AS day_c
      FROM events GROUP BY 1, 2
    ),
    dow AS (
      SELECT event_type, dayofweek(day) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(day_c) AS BIGINT) AS dow_sum_c
      FROM daily GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS total_days,
             CAST(SUM(day_c) AS BIGINT) AS total_c
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, CAST(d.dow AS INT) AS dow, d.n_days, d.dow_sum_c,
           CAST(d.dow_sum_c // d.n_days AS BIGINT) AS dow_mean_c,
           CAST(d.dow_sum_c * t.total_days * 1000000
                // (t.total_c * d.n_days) AS BIGINT) AS seasonal_ppm
    FROM dow d JOIN tot t ON d.event_type = t.event_type
    ORDER BY d.event_type, d.dow
    """,
    tags=("timeseries", "seasonality", "window"),
)
def ts_seasonal_dow_profile(spark, sf_dir):
    """Day-of-week SEASONAL PROFILE per event stream — the first half
    of a seasonal decomposition (the multiplicative index that
    deseasonalizes a daily series before anomaly detection or
    forecasting): daily totals in exact integer cents roll up to a
    per-(type, weekday) mean and a seasonal index in parts-per-million
    of the overall daily mean (``dow_sum·total_days·1e6 //
    (total_c·n_days)`` — a pure integer rational, so the index is
    bit-identical across engines; 1 000 000 = an average weekday).
    Weekday numbering is pinned to Sunday=0 (DuckDB's convention;
    Spark's 1-based dayofweek is shifted down).

    Scale shape: ONE |type × day|-sized shuffle for the daily rollup
    (map-side combined), then two tiny aggregates over |days| rows and
    a |types|-row join — at 100 TB the daily compaction dominates and
    parallelizes on the (type, day) hash; nothing downstream grows
    with the corpus."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        )
        .agg(F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("day_c"))
    )
    dow = (
        daily.groupBy(
            "event_type", (F.dayofweek("day") - F.lit(1)).cast("int").alias("dow")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("day_c").cast("bigint").alias("dow_sum_c"),
        )
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_days"),
        F.sum("day_c").cast("bigint").alias("total_c"),
    )
    return (
        dow.join(tot, "event_type")
        .select(
            "event_type",
            "dow",
            "n_days",
            "dow_sum_c",
            F.expr("dow_sum_c div n_days").cast("bigint").alias("dow_mean_c"),
            F.expr(
                "(dow_sum_c * total_days * 1000000) div (total_c * n_days)"
            ).cast("bigint").alias("seasonal_ppm"),
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# Holt's linear trend (round 8): the two-state sibling of the EWMA
# ---------------------------------------------------------------------------

_HOLT_SCHEMA = (
    "user_id bigint, n_events bigint, level double, trend double,"
    " forecast_1 double"
)


def _holt_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-key Holt recurrence (alpha = beta = 0.5) in plain IEEE ops:
    l' = 0.5*x + 0.5*(l + b); b' = 0.5*(l' - l) + 0.5*b — the same
    operation sequence the oracle's recursive CTE evaluates, so the
    doubles match bit-for-bit (halvings and adds only)."""
    pdf = pdf.sort_values(["ts", "event_id"])
    level = None
    trend = 0.0
    for x in pdf["value"]:
        x = float(x)
        if level is None:
            level = x
        else:
            new_level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.5 * (new_level - level) + 0.5 * trend
            level = new_level
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "level": [level],
            "trend": [trend],
            "forecast_1": [level + trend],
        }
    )


@register(
    "ts_holt_linear",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, CAST(value AS DOUBLE) AS value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 10
    ),
    r AS (
      SELECT user_id, rn, value AS l, CAST(0.0 AS DOUBLE) AS b
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT ev.user_id, ev.rn,
             0.5 * ev.value + 0.5 * (r.l + r.b),
             0.5 * ((0.5 * ev.value + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
    )
    SELECT user_id, CAST(rn AS BIGINT) AS n_events,
           l AS level, b AS trend, l + b AS forecast_1
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY rn DESC) AS rr
          FROM r)
    WHERE rr = 1
    """,
    tags=("timeseries", "pandas-udf", "stateful", "forecast"),
)
def ts_holt_linear(spark, sf_dir):
    """HOLT'S LINEAR TREND (double exponential smoothing, alpha =
    beta = 0.5) — the two-state extension of ts_ewma_recursive that a
    capacity-planning pipeline runs for short-horizon forecasts: the
    level tracks the series, the trend tracks its drift, and the
    one-step forecast is level + trend.  Like the EWMA this is the
    recurrence class SQL window frames cannot express (two coupled
    states over the full prefix), so it rides the same idiomatic
    escape hatch: ``groupBy(key).applyInPandas`` — sequential per key,
    embarrassingly parallel across keys, one Arrow batch per group.
    The oracle replays the IDENTICAL IEEE operation sequence with a
    two-column recursive CTE (the new level expression is repeated
    inside the trend update — deterministic recomputation, same
    bits), and alpha = beta = 0.5 keeps every step to halvings and
    adds, so the doubles match bit-for-bit with no rounding column."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", "ts", "event_id", "value")
    )
    return e.groupBy("user_id").applyInPandas(_holt_group, _HOLT_SCHEMA)


@register(
    "ts_time_weighted_average",
    oracle=f"""
    WITH seq AS (
      SELECT event_type, epoch_us(ts) AS tus, {_V100} AS v,
             LEAD(epoch_us(ts)) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS next_tus
      FROM events
    ),
    seg AS (
      SELECT event_type, v,
             CAST(next_tus - tus AS HUGEINT) AS dt
      FROM seq WHERE next_tus IS NOT NULL
    ),
    agg AS (
      SELECT event_type,
             CAST(SUM(CAST(v AS HUGEINT) * dt) AS HUGEINT) AS num,
             CAST(SUM(dt) AS HUGEINT) AS den,
             CAST(COUNT(*) AS BIGINT) AS n_segments
      FROM seg GROUP BY event_type
    )
    SELECT event_type, n_segments,
           CAST(den AS BIGINT) AS span_us,
           CAST(num // den AS BIGINT) AS twap_cents_floor,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS twap_cents
    FROM agg ORDER BY event_type
    """,
    tags=("timeseries", "twap", "window", "A-family"),
)
def ts_time_weighted_average(spark, sf_dir):
    """TIME-WEIGHTED AVERAGE over irregular samples — the integral
    ∫v·dt / ∫dt every ops dashboard and TWAP execution report needs
    when observations are NOT equally spaced (a plain AVG over
    irregular samples is biased toward bursts: 100 readings in a hot
    minute must not outweigh one reading that held for an hour).
    Each sample holds until the next one (step interpolation, the
    LOCF convention); the numerator Σ v·dt accumulates in
    DECIMAL(38,0)/HUGEINT — cents × µs products overflow int64 at any
    real span (the overflow-cliff class, pre-empted) — and the floor
    quotient is exact while the 6-dp double rides an identical IEEE
    tree.

    The ~5-value series key again (see ts_anomaly_zscore): a lead()
    window partitioned by event_type alone is a 5-task sort forever.
    lead is a 1-row LOOKAHEAD frame, so the chunked form is even
    simpler than a carry: operators/chunked.lead_one_bucketed — lead
    within (key, day-bucket) patched at bucket boundaries with the
    next non-empty bucket's first timestamp from a tiny metadata
    table.  The global last row of a key keeps NULL and stays the
    open final sample."""
    from lakehouse_cdc_spark.operators.chunked import lead_one_bucketed

    e = table(spark, sf_dir, "events")
    seq = lead_one_bucketed(
        e.select(
            "event_type",
            "ts",
            "event_id",
            F.unix_micros("ts").alias("tus"),
            F.expr(_V100).alias("v"),
        ),
        key_cols=["event_type"],
        order_cols=["ts", "event_id"],
        lead_col="tus",
        bucket=F.date_trunc("day", F.col("ts")),
        out_col="next_tus",
    )
    seg = seq.filter(F.col("next_tus").isNotNull()).select(
        "event_type",
        "v",
        (F.col("next_tus") - F.col("tus")).cast("decimal(38,0)").alias("dt"),
    )
    agg = seg.groupBy("event_type").agg(
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("dt"))
        .cast("decimal(38,0)")
        .alias("num"),
        F.sum("dt").cast("decimal(38,0)").alias("den"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
    )
    return agg.select(
        "event_type",
        "n_segments",
        F.col("den").cast("bigint").alias("span_us"),
        F.floor(F.col("num") / F.col("den"))
        .cast("bigint")
        .alias("twap_cents_floor"),
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("twap_cents"),
    ).orderBy("event_type")

"""Event-analytics declared queries: ordered funnels and cohort
retention — the two aggregate shapes every product-analytics engine
(and the reference's events firehose) ultimately serves.

- ``events_funnel_ordered`` — a 3-stage ORDERED funnel (view → click
  → purchase): each later stage must happen strictly after the user's
  entry into the previous one, which is what distinguishes a funnel
  from three independent filters.
- ``events_retention_cohorts`` — the weekly cohort retention matrix:
  users grouped by first-seen week, activity bucketed by whole weeks
  since, retention as an exact rational per cell.

Scale notes (100 TB): both queries reduce the event stream ONCE by
user (map-side-combined partials where possible, a single user-keyed
shuffle otherwise) and then aggregate tiny per-user rows; nothing
joins event-to-event.  The funnel's sequential constraint is computed
from per-user stage minima — three conditional aggregates over one
grouped pass, not a self-join — so cost is O(events) at any scale.
The retention matrix is |cohorts x offsets| cells (~20 here), an
output 10^6x smaller than its input.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table


@register(
    "events_funnel_ordered",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3
    )
    SELECT stage, n_users, conv_from_prev, conv_from_top FROM (
      SELECT 1 AS ord, 'view' AS stage, n1 AS n_users,
             CAST(1.0 AS DOUBLE) AS conv_from_prev,
             CAST(1.0 AS DOUBLE) AS conv_from_top
      FROM counts
      UNION ALL
      SELECT 2, 'view>click', n2,
             round(CAST(n2 AS DOUBLE) / n1, 6),
             round(CAST(n2 AS DOUBLE) / n1, 6)
      FROM counts
      UNION ALL
      SELECT 3, 'view>click>purchase', n3,
             round(CAST(n3 AS DOUBLE) / n2, 6),
             round(CAST(n3 AS DOUBLE) / n1, 6)
      FROM counts
    ) ORDER BY ord
    """,
    tags=("events", "funnel", "analytics", "A4"),
)
def events_funnel_ordered(spark, sf_dir):
    """Ordered 3-stage funnel (view → click → purchase): stage N
    counts users whose earliest stage-N event falls STRICTLY after
    their entry into stage N-1 — the ordering constraint that makes it
    a funnel rather than three independent filters.  Each stage is one
    user-keyed min-aggregate over a filtered scan joined to the
    previous stage's (user, t) table — per-user state is a single
    timestamp, no event-to-event self-join, so the funnel is O(events)
    with map-side partial minima at any scale.  Conversion rates are
    derived from exact counts and rounded at the end."""
    ev = table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n3")))
    )
    r1 = counts.select(
        F.lit(1).alias("ord"),
        F.lit("view").alias("stage"),
        F.col("n1").alias("n_users"),
        F.lit(1.0).alias("conv_from_prev"),
        F.lit(1.0).alias("conv_from_top"),
    )
    r2 = counts.select(
        F.lit(2).alias("ord"),
        F.lit("view>click").alias("stage"),
        F.col("n2").alias("n_users"),
        F.round(F.col("n2").cast("double") / F.col("n1"), 6).alias(
            "conv_from_prev"
        ),
        F.round(F.col("n2").cast("double") / F.col("n1"), 6).alias(
            "conv_from_top"
        ),
    )
    r3 = counts.select(
        F.lit(3).alias("ord"),
        F.lit("view>click>purchase").alias("stage"),
        F.col("n3").alias("n_users"),
        F.round(F.col("n3").cast("double") / F.col("n2"), 6).alias(
            "conv_from_prev"
        ),
        F.round(F.col("n3").cast("double") / F.col("n1"), 6).alias(
            "conv_from_top"
        ),
    )
    return (
        r1.unionAll(r2)
        .unionAll(r3)
        .orderBy("ord")
        .select("stage", "n_users", "conv_from_prev", "conv_from_top")
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0
      FROM events GROUP BY user_id
    ),
    anchored AS (
      SELECT f.user_id,
             date_diff('day', DATE '2024-01-01', f.d0) // 7 AS cohort_week,
             date_diff('day', f.d0, CAST(date_trunc('day', e.ts) AS DATE)) // 7
               AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    ),
    active AS (
      SELECT DISTINCT user_id, cohort_week, week_offset FROM anchored
    ),
    sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM active WHERE week_offset = 0 GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           s.cohort_size,
           round(CAST(COUNT(*) AS DOUBLE) / s.cohort_size, 6) AS retention
    FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    ORDER BY a.cohort_week, a.week_offset
    """,
    tags=("events", "retention", "cohort", "analytics", "A4"),
)
def events_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention matrix: users are anchored to their
    first-seen day, cohorts keyed by whole weeks from the corpus
    epoch, activity bucketed by whole weeks since each user's anchor,
    and every (cohort, offset) cell reports distinct active users over
    cohort size.  All bucketing is integer day arithmetic (epoch-day
    differences, floor-div 7) so cells match the oracle exactly;
    retention is the exact rational rounded at the end.  Shape: one
    user-keyed min (first-seen), one broadcastable (user, anchor)
    join back onto the stream, a distinct over per-user-week rows, and
    a cells-sized aggregate — the matrix is ~|cohorts x offsets| rows
    regardless of corpus size."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("d0")
    )
    anchored = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            F.expr("datediff(d0, DATE '2024-01-01') div 7").alias("cohort_week"),
            F.expr(
                "datediff(to_date(date_trunc('day', ts)), d0) div 7"
            ).alias("week_offset"),
        )
    )
    active = anchored.distinct()
    sizes = (
        active.filter(F.col("week_offset") == 0)
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


_RAU_WINDOW = 7  # trailing days per active-user window


@register(
    "events_rolling_active_users",
    bench=True,
    oracle=f"""
    WITH daily AS (
      SELECT DISTINCT
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d,
             user_id
      FROM events
    ),
    spine AS (SELECT DISTINCT d FROM daily),
    contrib AS (
      SELECT DISTINCT daily.d + k.k AS target_d, daily.user_id
      FROM daily, range(0, {_RAU_WINDOW}) k(k)
    ),
    dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM daily GROUP BY d
    )
    SELECT s.d AS day_index,
           strftime(DATE '2024-01-01' + INTERVAL (s.d) DAY, '%Y-%m-%d') AS day,
           dau.dau,
           CAST(COUNT(*) AS BIGINT) AS wau
    FROM spine s
    JOIN contrib c ON c.target_d = s.d
    JOIN dau ON dau.d = s.d
    GROUP BY s.d, dau.dau
    ORDER BY s.d
    """,
    tags=("events", "rolling-distinct", "wau", "analytics", "A3-scale"),
)
def events_rolling_active_users(spark, sf_dir):
    """Rolling 7-day active users (WAU beside DAU) — the sliding
    DISTINCT aggregate naive SQL cannot window (count(distinct) over a
    frame is unsupported and a per-day self-join over the stream is
    quadratic).  The scale formulation: reduce the stream ONCE to
    distinct (day, user) pairs, fan each pair out to the <=7 target
    days it can serve (a bounded map-side explode — no range join, no
    re-scan), distinct the contributions, and count per day.  Shuffle
    volume is |daily actives| x 7 regardless of event volume; the
    oracle states the same thing with a range() cross join.  This
    fan-out-to-targets trick is how every sliding-distinct metric
    (WAU/MAU, rolling buyers) ships at warehouse scale."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(
                "datediff(to_date(date_trunc('day', ts)), DATE '2024-01-01')"
            ).alias("d"),
            "user_id",
        )
        .distinct()
        # spine, fan-out and DAU all read the distinct (day, user) set;
        # one materialization per invocation (localCheckpoint, not a
        # CacheManager-leaking persist)
        .localCheckpoint()
    )
    spine = daily.select("d").distinct()
    ks = F.explode(F.array(*[F.lit(i) for i in range(_RAU_WINDOW)])).alias("k")
    contrib = (
        daily.select("d", "user_id", ks)
        .select((F.col("d") + F.col("k")).alias("target_d"), "user_id")
        .distinct()
    )
    dau = daily.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        spine.join(contrib, F.col("target_d") == F.col("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("wau"))
        .join(dau, "d")
        .select(
            F.col("d").alias("day_index"),
            F.date_format(
                F.expr("date_add(DATE '2024-01-01', CAST(d AS INT))"),
                "yyyy-MM-dd",
            ).alias("day"),
            "dau",
            "wau",
        )
        .orderBy("day_index")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    outs AS (
      SELECT from_type, SUM(n) AS n_out FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           round(CAST(t.n AS DOUBLE) / o.n_out, 6) AS p
    FROM trans t JOIN outs o ON t.from_type = o.from_type
    ORDER BY t.from_type, t.to_type
    """,
    tags=("events", "markov", "sequence", "analytics", "W1"),
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the sequence-analytics
    primitive behind next-action prediction and anomalous-flow
    detection.  Successors come from ONE lead() window per user (the
    stream's natural key partitioning, totally ordered by (ts,
    event_id)), transitions aggregate map-side into |types|^2 cells,
    and probabilities are exact rationals rounded at the end — the
    matrix is 25 cells here and stays |alphabet|^2 at any corpus
    size."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outs = trans.groupBy("from_type").agg(F.sum("n").alias("n_out"))
    return (
        trans.join(F.broadcast(outs), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_out"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "events_interarrival_histogram",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    gaps AS (
      SELECT epoch_us(ts) - epoch_us(prev_ts) AS gap_us
      FROM seq WHERE prev_ts IS NOT NULL
    ),
    bucketed AS (
      -- log2-ish buckets over minutes: 0, 1, 2, 4, 8, ... via
      -- integer bit length of the whole-minute gap
      SELECT CASE WHEN gap_us < 60000000 THEN 0
                  ELSE CAST(floor(log2(gap_us // 60000000)) AS BIGINT) + 1
             END AS bucket
      FROM gaps
    )
    SELECT bucket,
           CASE WHEN bucket = 0 THEN 0
                ELSE CAST(pow(2, bucket - 1) AS BIGINT) END AS lo_minutes,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("events", "interarrival", "histogram", "analytics", "W1"),
)
def events_interarrival_histogram(spark, sf_dir):
    """Inter-arrival time distribution per user stream, in doubling
    (log2) minute buckets — the burstiness profile behind session-gap
    and TTL tuning (the 30-minute session threshold and state-store
    TTLs upstream are read off exactly this histogram).  One lag()
    window per user, then a map-side bucket aggregate into ~15 cells.
    Buckets are computed from INTEGER whole-minute gaps, and log2 of
    an integer's value used only to pick the power-of-two bucket —
    exact for any count that fits an int (both engines' log2 of 2^k
    is exactly k, and non-powers floor identically since the true
    log2 is irrational, never on a representability boundary)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "ts", F.lag("ts").over(w).alias("prev_ts")
        )
        .filter(F.col("prev_ts").isNotNull())
        .select(
            (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("gap_us")
        )
    )
    bucket = (
        F.when(F.col("gap_us") < 60_000_000, F.lit(0))
        .otherwise(
            F.floor(F.log2(F.expr("gap_us div 60000000"))).cast("bigint") + 1
        )
        .alias("bucket")
    )
    return (
        gaps.select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
        .select(
            "bucket",
            F.when(F.col("bucket") == 0, 0)
            .otherwise(F.pow(F.lit(2), F.col("bucket") - 1).cast("bigint"))
            .alias("lo_minutes"),
            "n_gaps",
        )
        .orderBy("bucket")
    )


@register(
    "events_activity_gini",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x FROM events
      GROUP BY user_id
    ),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM per_user
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             SUM(i * x) AS six  -- HUGEINT: Σi·x ~ n²·avg cliffs int64
      FROM ranked
    )
    SELECT n, sx,
           CAST(2 * six - CAST(n + 1 AS HUGEINT) * sx AS VARCHAR)
             AS gini_num,
           CAST(CAST(n AS HUGEINT) * sx AS VARCHAR) AS gini_den,
           round(CAST(2 * six - CAST(n + 1 AS HUGEINT) * sx AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * sx AS DOUBLE), 6)
             AS gini
    FROM agg
    """,
    tags=("events", "gini", "concentration", "analytics", "A4"),
)
def events_activity_gini(spark, sf_dir):
    """Gini coefficient of per-user activity — the concentration
    number behind whale analysis and abuse heuristics (0 = everyone
    equally active, →1 = a few users generate everything).  Uses the
    rank formulation G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over
    ascending-sorted counts with a total order (key tie-break);
    Σi·x grows as n²·mean, so it accumulates in DECIMAL(38,0)/HUGEINT
    and the exact numerator/denominator emit as digit strings (the
    128-bit discipline of stats_correlation_matrix), keeping the
    rounded ratio engine-identical at any population.  NO window at
    all: ranks within a tie group (same x) are consecutive integers
    whatever the user order, so the rank-sum has the closed form
    Σ_(group x) i = cnt·below + cnt·(cnt+1)/2 with below = count of
    users with smaller x.  Grouping the |users|-sized count table by
    DISTINCT x (a small set — activity counts repeat heavily) and
    combining strictly-lower groups by broadcast
    (operators/prefix.py:lower_bucket_agg, with x itself as the
    bucket) yields 2·Σi·x exactly, in DECIMAL(38,0), with one extra
    tiny self-join instead of a SinglePartition global row_number."""
    from lakehouse_cdc_spark.operators.prefix import lower_bucket_agg

    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    byx = per_user.groupBy("x").agg(F.count(F.lit(1)).alias("cnt"))
    below = lower_bucket_agg(byx, "x", "cnt", "n_below")
    dec = lambda c: c.cast("decimal(38,0)")
    # 2·Σ ranks in group x = 2·cnt·below + cnt·(cnt+1)  (no halving →
    # no division anywhere; everything stays exact integer decimal)
    six2_term = dec(F.col("x")) * (
        F.lit(2).cast("decimal(38,0)") * dec(F.col("cnt")) * dec(F.col("n_below"))
        + dec(F.col("cnt")) * (dec(F.col("cnt")) + F.lit(1).cast("decimal(38,0)"))
    )
    num = F.col("six2") - (F.col("n") + 1).cast("decimal(38,0)") * F.col("sx")
    den = F.col("n").cast("decimal(38,0)") * F.col("sx")
    return (
        byx.join(F.broadcast(below), "x")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum(F.col("x") * F.col("cnt")).cast("bigint").alias("sx"),
            F.sum(six2_term).alias("six2"),
        )
        .select(
            "n",
            "sx",
            num.cast("decimal(38,0)").cast("string").alias("gini_num"),
            den.cast("decimal(38,0)").cast("string").alias("gini_den"),
            F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
        )
    )


@register(
    "events_cohort_ltv",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0
      FROM events GROUP BY user_id
    ),
    anchored AS (
      SELECT f.user_id,
             date_diff('day', DATE '2024-01-01', f.d0) // 7 AS cohort_week,
             date_diff('day', f.d0, CAST(date_trunc('day', e.ts) AS DATE)) // 7
               AS week_offset,
             CAST(ROUND(e.value * 100) AS BIGINT) AS v
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cohort_size
      FROM anchored WHERE week_offset = 0 GROUP BY cohort_week
    ),
    weekly AS (
      SELECT cohort_week, week_offset, CAST(SUM(v) AS BIGINT) AS value_cents
      FROM anchored GROUP BY cohort_week, week_offset
    ),
    cum AS (
      SELECT cohort_week, week_offset, value_cents,
             SUM(value_cents) OVER (PARTITION BY cohort_week
                                    ORDER BY week_offset) AS cum_cents
      FROM weekly
    )
    SELECT c.cohort_week, c.week_offset, c.value_cents,
           CAST(c.cum_cents AS BIGINT) AS cum_value_cents,
           s.cohort_size,
           round(CAST(c.cum_cents AS DOUBLE) / s.cohort_size / 100.0, 4)
             AS ltv_per_user
    FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
    ORDER BY c.cohort_week, c.week_offset
    """,
    tags=("events", "ltv", "cohort", "analytics", "W1"),
)
def events_cohort_ltv(spark, sf_dir):
    """Cohort LTV curves — the money companion to the retention
    matrix: per (cohort, weeks-since-anchor) cell, weekly and
    CUMULATIVE value with per-user LTV, which is the number pricing
    and acquisition budgets are set against.  Value rides the x100
    fixed-point bigint; the cumulative is a per-cohort window over the
    cells-sized weekly table, so nothing re-reads events; per-user
    dollars are derived once at the end.  Same anchored-bucketing
    integer math as events_retention_cohorts — the two queries share
    cells, and a real dashboard computes them in one pass."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("d0")
    )
    anchored = ev.join(first_seen, "user_id").select(
        "user_id",
        F.expr("datediff(d0, DATE '2024-01-01') div 7").alias("cohort_week"),
        F.expr("datediff(to_date(date_trunc('day', ts)), d0) div 7").alias(
            "week_offset"
        ),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
    )
    sizes = (
        anchored.filter(F.col("week_offset") == 0)
        .groupBy("cohort_week")
        .agg(F.countDistinct("user_id").alias("cohort_size"))
    )
    weekly = anchored.groupBy("cohort_week", "week_offset").agg(
        F.sum("v").cast("bigint").alias("value_cents")
    )
    cum = weekly.withColumn(
        "cum_cents",
        F.sum("value_cents").over(
            Window.partitionBy("cohort_week").orderBy("week_offset")
        ),
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "value_cents",
            F.col("cum_cents").cast("bigint").alias("cum_value_cents"),
            "cohort_size",
            F.round(
                F.col("cum_cents").cast("double") / F.col("cohort_size") / 100.0,
                4,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Event-pattern matching (round 7): MATCH_RECOGNIZE-style V shapes
# ---------------------------------------------------------------------------

_V_MIN_LEG = 2  # both the decline and the recovery need >= 2 strict steps


@register(
    "events_pattern_vshape",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS tus, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS prev_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    dirs AS (
      SELECT user_id, tus, event_id, v, prev_v,
             CASE WHEN v > prev_v THEN 1
                  WHEN v < prev_v THEN -1 ELSE 0 END AS dir,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY tus, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id,
                                  CASE WHEN v > prev_v THEN 1
                                       WHEN v < prev_v THEN -1 ELSE 0 END
                                  ORDER BY tus, event_id) AS grp
      FROM seq WHERE prev_v IS NOT NULL
    ),
    annotated AS (
      SELECT user_id, dir, grp,
             COUNT(*) OVER p AS run_len,
             first_value(prev_v) OVER o AS base_v,
             first_value(v) OVER od AS end_v,
             first_value(tus) OVER o AS first_tus,
             first_value(tus) OVER od AS last_tus,
             ROW_NUMBER() OVER o AS rn
      FROM dirs
      WINDOW p AS (PARTITION BY user_id, grp),
             o AS (PARTITION BY user_id, grp ORDER BY tus, event_id),
             od AS (PARTITION BY user_id, grp ORDER BY tus DESC, event_id DESC)
    ),
    runs AS (
      SELECT user_id, dir, run_len, base_v, end_v, first_tus, last_tus,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY first_tus)
               AS run_seq
      FROM annotated WHERE rn = 1
    )
    SELECT d.user_id,
           CAST(d.last_tus AS BIGINT) AS valley_us,
           CAST(d.run_len AS BIGINT) AS down_len,
           CAST(u.run_len AS BIGINT) AS up_len,
           CAST(d.base_v - d.end_v AS BIGINT) AS depth_c,
           CAST(u.end_v - u.base_v AS BIGINT) AS recovery_c
    FROM runs d JOIN runs u
      ON u.user_id = d.user_id AND u.run_seq = d.run_seq + 1
    WHERE d.dir = -1 AND u.dir = 1
      AND d.run_len >= {_V_MIN_LEG} AND u.run_len >= {_V_MIN_LEG}
    ORDER BY d.user_id, valley_us
    """,
    tags=("events", "pattern", "match-recognize", "W-family"),
)
def events_pattern_vshape(spark, sf_dir):
    """MATCH_RECOGNIZE-style EVENT-PATTERN DETECTION without the SQL
    extension (Spark has no MATCH_RECOGNIZE; Flink/Trino ship it): per
    user stream, find every V-shape — a run of >= 2 strictly falling
    values immediately followed by a run of >= 2 strictly rising
    values (the drawdown-and-recovery motif behind churn saves, price
    bounce alerts, and degraded-then-healed SLO episodes).  Pattern
    states are compiled to window algebra: direction per step (lag),
    gaps-and-islands run ids (double row_number difference), per-run
    aggregates via framed windows, then a self-join of CONSECUTIVE
    runs (run_seq + 1) — the regex ``DOWN{{2,}} UP{{2,}}`` as exactly
    two window passes and one narrow join.  Everything is exact
    integer cents and epoch-µs, so matches are bit-identical across
    engines.

    Scale shape: two user-keyed exchanges total (plan-verified —
    user_id for the step/lag pass, (user_id, dir) for the island
    numbering); every key includes user_id, so no cross-user traffic
    exists anywhere, and the runs self-join is on (user_id, run_seq)
    over the already-shrunk run table.  At 100 TB: per-user sequences
    are the unit of parallelism, identical to sessionization."""
    e = table(spark, sf_dir, "events")
    v = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        "event_id",
        v.alias("v"),
        F.lag(v).over(w).alias("prev_v"),
    ).filter(F.col("prev_v").isNotNull())
    dir_col = (
        F.when(F.col("v") > F.col("prev_v"), 1)
        .when(F.col("v") < F.col("prev_v"), -1)
        .otherwise(0)
    )
    wu = Window.partitionBy("user_id").orderBy("tus", "event_id")
    wd = Window.partitionBy("user_id", "dir").orderBy("tus", "event_id")
    dirs = seq.withColumn("dir", dir_col).withColumn(
        "grp", F.row_number().over(wu) - F.row_number().over(wd)
    )
    # Per-run rollup as ONE algebraic aggregate: every per-run value is
    # an argmin/argmax or extremum over the (tus, event_id) total order
    # (first-row dir/base_v = min_by, last-row end_v = max_by, first/
    # last tus = min/max), so map tasks fold their rows to one partial
    # per (user_id, grp) before the exchange — the previous form
    # shuffled every step row to three framed windows plus a rank-1
    # pick.  Grouping keys and pick order are EXACTLY the old window
    # partition/order, so rows are identical (oracle-pinned).
    ordk = F.struct("tus", "event_id")
    annotated = dirs.groupBy("user_id", "grp").agg(
        F.min_by("dir", ordk).alias("dir"),
        F.count(F.lit(1)).alias("run_len"),
        F.min_by("prev_v", ordk).alias("base_v"),
        F.max_by("v", ordk).alias("end_v"),
        F.min("tus").alias("first_tus"),
        F.max("tus").alias("last_tus"),
    )
    runs = annotated.withColumn(
        "run_seq",
        F.row_number().over(Window.partitionBy("user_id").orderBy("first_tus")),
    )
    d = runs.alias("d")
    u = runs.alias("u")
    return (
        d.join(
            u,
            (F.col("u.user_id") == F.col("d.user_id"))
            & (F.col("u.run_seq") == F.col("d.run_seq") + 1),
        )
        .filter(
            (F.col("d.dir") == -1)
            & (F.col("u.dir") == 1)
            & (F.col("d.run_len") >= _V_MIN_LEG)
            & (F.col("u.run_len") >= _V_MIN_LEG)
        )
        .select(
            F.col("d.user_id").alias("user_id"),
            F.col("d.last_tus").cast("bigint").alias("valley_us"),
            F.col("d.run_len").cast("bigint").alias("down_len"),
            F.col("u.run_len").cast("bigint").alias("up_len"),
            (F.col("d.base_v") - F.col("d.end_v")).cast("bigint").alias("depth_c"),
            (F.col("u.end_v") - F.col("u.base_v")).cast("bigint").alias("recovery_c"),
        )
        .orderBy("user_id", "valley_us")
    )


_SESSION_GAP_US = 1_800_000_000  # 30 min of inactivity starts a new session


@register(
    "events_sessionize_batch",
    bench=True,
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
             LAG(epoch_us(ts)) OVER w AS prev_tus
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT user_id, event_id, event_type, tus,
             CASE WHEN prev_tus IS NULL
                       OR tus - prev_tus > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM seq
    ),
    numbered AS (
      SELECT user_id, event_id, event_type, tus,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sess_idx
      FROM flagged
    )
    SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx,
           CAST(MIN(tus) AS BIGINT) AS session_start_us,
           CAST(MAX(tus) - MIN(tus) AS BIGINT) AS duration_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM numbered GROUP BY user_id, sess_idx
    ORDER BY user_id, sess_idx
    """,
    tags=("events", "sessionization", "window", "W-family"),
)
def events_sessionize_batch(spark, sf_dir):
    """BATCH SESSIONIZATION with a 30-minute inactivity gap — the
    batch twin of the streaming session windows
    (streaming/windows.py) and the reference's own thirty-minute
    lookback concept (src/validation/validation.py's
    ``thirty_mins_ago`` re-validation window), done as pure window
    algebra: a session opens where the inter-event gap exceeds 30
    minutes (lag), session ids are the running sum of open flags, and
    one groupBy rolls each session up to start / duration / event
    census.  Exact epoch-µs integers throughout.

    Scale shape: both window passes and the final rollup partition by
    user_id — ONE hash exchange total (Spark reuses the partitioning
    across lag, running sum, and groupBy); per-user sequences are the
    parallelism unit, the canonical sessionization posture at any
    corpus size."""
    e = table(spark, sf_dir, "events")
    # Both windows order by (tus, event_id) — unix_micros is strictly
    # monotonic in ts, so the order is the one the ts-keyed spec
    # expressed, and because the sort keys now MATCH the running-sum
    # window's, Catalyst drops the second per-partition Sort pass the
    # old mixed ts/tus specs forced (it cannot prove unix_micros(ts)
    # and ts sort identically).
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seq = seq.withColumn("prev_tus", F.lag("tus").over(w))
    flagged = seq.withColumn(
        "new_sess",
        F.when(
            F.col("prev_tus").isNull()
            | (F.col("tus") - F.col("prev_tus") > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("sess_idx", F.sum("new_sess").over(ws))
    return (
        numbered.groupBy("user_id", F.col("sess_idx").cast("bigint").alias("sess_idx"))
        .agg(
            F.min("tus").cast("bigint").alias("session_start_us"),
            (F.max("tus") - F.min("tus")).cast("bigint").alias("duration_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
        )
        .orderBy("user_id", "sess_idx")
    )


_WEEK_US = 604_800_000_000  # 7 days in epoch-µs; engine-neutral weeks


@register(
    "events_growth_accounting",
    oracle=f"""
    WITH uw AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS w
      FROM events
    ),
    lagged AS (
      SELECT user_id, w,
             LAG(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w
      FROM uw
    ),
    maxw AS (SELECT MAX(w) AS mw FROM uw),
    lastw AS (SELECT user_id, MAX(w) AS lw FROM uw GROUP BY user_id),
    activity AS (
      SELECT w, CASE WHEN prev_w IS NULL THEN 'new'
                     WHEN prev_w = w - 1 THEN 'retained'
                     ELSE 'resurrected' END AS kind
      FROM lagged
      UNION ALL
      SELECT prev_w + 1, 'churned' FROM lagged WHERE prev_w < w - 1
      UNION ALL
      SELECT l.lw + 1, 'churned' FROM lastw l, maxw m WHERE l.lw < m.mw
    )
    SELECT CAST(w AS BIGINT) AS week,
           CAST(SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN kind = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_churned
    FROM activity GROUP BY w ORDER BY week
    """,
    tags=("events", "growth", "retention", "W-family"),
)
def events_growth_accounting(spark, sf_dir):
    """GROWTH ACCOUNTING (the new / retained / resurrected / churned
    weekly ledger every growth team reports): user-weeks classify by
    the lag of their previous active week — first week ever = new,
    consecutive = retained, gap = resurrected — and churn events post
    to the week AFTER activity stopped (both mid-history gaps and
    end-of-history exits, the latter against the corpus max week).
    Weeks are engine-neutral integer epoch-µs floor-divisions (no
    engine's week-truncation convention involved).  The identity
    actives(w) = new + retained + resurrected is structural; churn
    closes the ledger so week-over-week active deltas reconcile
    exactly — all integer counts.

    Scale shape: ONE user-keyed window pass over the deduplicated
    user-week table (itself a map-side distinct), a per-user max, a
    one-row max broadcast, and a |weeks|-sized rollup.  Per-user
    histories are the parallelism unit; nothing global but the
    one-row max."""
    e = table(spark, sf_dir, "events")
    uw = e.select(
        "user_id",
        # integer div, NOT `/`: epoch-µs exceeds 2^53, so a double
        # quotient could misplace a week boundary vs the oracle's
        # exact `//`
        F.expr(f"unix_micros(ts) div {_WEEK_US}").cast("bigint").alias("w"),
    ).distinct()
    lagged = uw.withColumn(
        "prev_w", F.lag("w").over(Window.partitionBy("user_id").orderBy("w"))
    )
    maxw = uw.agg(F.max("w").alias("mw"))
    lastw = uw.groupBy("user_id").agg(F.max("w").alias("lw"))
    kind = (
        F.when(F.col("prev_w").isNull(), "new")
        .when(F.col("prev_w") == F.col("w") - 1, "retained")
        .otherwise("resurrected")
    )
    activity = (
        lagged.select("w", kind.alias("kind"))
        .unionByName(
            lagged.filter(F.col("prev_w") < F.col("w") - 1).select(
                (F.col("prev_w") + 1).alias("w"), F.lit("churned").alias("kind")
            )
        )
        .unionByName(
            lastw.crossJoin(F.broadcast(maxw))
            .filter(F.col("lw") < F.col("mw"))
            .select((F.col("lw") + 1).alias("w"), F.lit("churned").alias("kind"))
        )
    )
    agg = [
        F.sum(F.when(F.col("kind") == k, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{k}")
        for k in ("new", "retained", "resurrected", "churned")
    ]
    return (
        activity.groupBy(F.col("w").cast("bigint").alias("week"))
        .agg(*agg)
        .orderBy("week")
    )


_DAY_US = 86_400_000_000


@register(
    "events_activity_streaks",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d
      FROM events
    ),
    islands AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM ud
    ),
    streaks AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM islands GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id, MAX(len) AS best_streak FROM streaks GROUP BY user_id
    )
    SELECT CAST(best_streak AS BIGINT) AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM best GROUP BY best_streak ORDER BY streak_days
    """,
    tags=("events", "streaks", "engagement", "W-family"),
)
def events_activity_streaks(spark, sf_dir):
    """LONGEST DAILY-ACTIVITY STREAK distribution — the engagement
    metric behind every "n-day streak" product mechanic: per user, the
    distinct active days form gaps-and-islands runs (day − dense
    position is constant within a consecutive run), the user's best
    streak is their longest island, and the corpus rolls up to a
    streak-length histogram.  Days are engine-neutral integer epoch-µs
    floor-divisions; every count exact.

    Scale shape: map-side distinct to user-days, ONE user-keyed window
    pass for island ids, two shrinking aggregates (user-streaks, then
    the |distinct streak lengths|-row histogram).  Per-user histories
    parallelize on the user hash — the sessionization posture at
    day granularity."""
    e = table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d"),
    ).distinct()
    islands = ud.withColumn(
        "grp",
        F.col("d")
        - F.row_number().over(Window.partitionBy("user_id").orderBy("d")),
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("best_streak"))
    return (
        best.groupBy(F.col("best_streak").cast("bigint").alias("streak_days"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("streak_days")
    )


# ---------------------------------------------------------------------------
# Marketing attribution (round 8): multi-touch credit assignment
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_US = 7 * 86_400_000_000  # credit touches within 7 days


@register(
    "events_attribution_multitouch",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END
               AS is_touch,
             CASE WHEN event_type = 'view' THEN epoch_us(ts) * 4
                  WHEN event_type = 'click' THEN epoch_us(ts) * 4 + 1
             END AS enc
      FROM events
    ),
    framed AS (
      SELECT user_id, event_id, event_type, v,
             SUM(is_touch) OVER w AS n_t,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
               AS n_view,
             MIN(enc) OVER w AS enc_first,
             MAX(enc) OVER w AS enc_last
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN {_ATTR_LOOKBACK_US} PRECEDING
                   AND 1 PRECEDING)
    ),
    purch AS (
      SELECT v, n_t, n_view,
             CAST(enc_first % 4 AS INTEGER) AS ft_code,
             CAST(enc_last % 4 AS INTEGER) AS lt_code,
             CASE WHEN n_t > 0 THEN v // n_t END AS q,
             CASE WHEN n_t > 0 THEN v % n_t END AS r
      FROM framed WHERE event_type = 'purchase'
    ),
    agg AS (
      SELECT
        COUNT(*) FILTER (ft_code = 0) AS nf_view,
        COUNT(*) FILTER (ft_code = 1) AS nf_click,
        COUNT(*) FILTER (n_t IS NULL OR n_t = 0) AS n_orphan,
        COALESCE(SUM(v) FILTER (ft_code = 0), 0) AS ft_view,
        COALESCE(SUM(v) FILTER (ft_code = 1), 0) AS ft_click,
        COALESCE(SUM(v) FILTER (n_t IS NULL OR n_t = 0), 0) AS v_orphan,
        COUNT(*) FILTER (lt_code = 0) AS nl_view,
        COUNT(*) FILTER (lt_code = 1) AS nl_click,
        COALESCE(SUM(v) FILTER (lt_code = 0), 0) AS lt_view,
        COALESCE(SUM(v) FILTER (lt_code = 1), 0) AS lt_click,
        COALESCE(SUM(q * n_view + CASE WHEN ft_code = 0 THEN r ELSE 0 END)
                 FILTER (n_t > 0), 0) AS lin_view,
        COALESCE(SUM(q * (n_t - n_view)
                     + CASE WHEN ft_code = 1 THEN r ELSE 0 END)
                 FILTER (n_t > 0), 0) AS lin_click
      FROM purch
    )
    SELECT 'view' AS touch_type, CAST(nf_view AS BIGINT) AS n_first,
           CAST(nl_view AS BIGINT) AS n_last,
           CAST(ft_view AS BIGINT) AS first_touch_cents,
           CAST(lt_view AS BIGINT) AS last_touch_cents,
           CAST(lin_view AS BIGINT) AS linear_cents
    FROM agg
    UNION ALL
    SELECT 'click', CAST(nf_click AS BIGINT), CAST(nl_click AS BIGINT),
           CAST(ft_click AS BIGINT), CAST(lt_click AS BIGINT),
           CAST(lin_click AS BIGINT)
    FROM agg
    UNION ALL
    SELECT '(none)', CAST(n_orphan AS BIGINT), CAST(n_orphan AS BIGINT),
           CAST(v_orphan AS BIGINT), CAST(v_orphan AS BIGINT),
           CAST(v_orphan AS BIGINT)
    FROM agg
    ORDER BY touch_type
    """,
    tags=("events", "attribution", "window", "analytics", "W-family"),
)
def events_attribution_multitouch(spark, sf_dir):
    """MULTI-TOUCH ATTRIBUTION — first-touch, last-touch, and linear
    credit assignment of every purchase's value to the user's
    view/click touches in the 7 days strictly before it, the query
    every marketing warehouse runs nightly (Flink/Trino users build it
    with MATCH_RECOGNIZE; here it is pure window algebra Spark
    executes in ONE user-keyed exchange).  No purchase×touch join ever
    materializes: a value-based RANGE frame over epoch-µs carries the
    touch census (count per type) and the first/last touch IDENTITY —
    the touch's type rides inside a ``tus*4+code`` integer so one
    MIN/MAX over the frame recovers it (min_by/max_by don't exist as
    frame aggregates).  Linear credit is exact integer division:
    q = v div n to every touch, remainder to the first touch's type,
    so the three schemes each redistribute every attributed cent
    (Σ linear = Σ first = Σ last, testable to the cent).  Purchases
    with no prior touch land in the '(none)' row — the orphan audit.
    Scale shape: the frame, the purchase filter, and the rollup share
    one user_id hash partitioning; state per user is the 7-day touch
    window, the same bound the streaming interval join carries."""
    e = table(spark, sf_dir, "events")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
        F.when(F.col("event_type").isin("view", "click"), 1)
        .otherwise(0)
        .alias("is_touch"),
        F.when(F.col("event_type") == "view", F.unix_micros("ts") * 4)
        .when(F.col("event_type") == "click", F.unix_micros("ts") * 4 + 1)
        .alias("enc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-_ATTR_LOOKBACK_US, -1)
    )
    framed = seq.select(
        "event_type",
        "v",
        F.sum("is_touch").over(w).alias("n_t"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w)
        .alias("n_view"),
        F.min("enc").over(w).alias("enc_first"),
        F.max("enc").over(w).alias("enc_last"),
    )
    purch = framed.filter(F.col("event_type") == "purchase").select(
        "v",
        "n_t",
        "n_view",
        (F.col("enc_first") % 4).cast("int").alias("ft_code"),
        (F.col("enc_last") % 4).cast("int").alias("lt_code"),
        F.when(F.col("n_t") > 0, F.expr("v div n_t")).alias("q"),
        F.when(F.col("n_t") > 0, F.expr("v % n_t")).alias("r"),
    )
    a = purch.agg(
        F.count(F.when(F.col("ft_code") == 0, 1)).alias("nf_view"),
        F.count(F.when(F.col("ft_code") == 1, 1)).alias("nf_click"),
        F.count(
            F.when(F.col("n_t").isNull() | (F.col("n_t") == 0), 1)
        ).alias("n_orphan"),
        F.coalesce(
            F.sum(F.when(F.col("ft_code") == 0, F.col("v"))), F.lit(0)
        ).alias("ft_view"),
        F.coalesce(
            F.sum(F.when(F.col("ft_code") == 1, F.col("v"))), F.lit(0)
        ).alias("ft_click"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n_t").isNull() | (F.col("n_t") == 0), F.col("v")
                )
            ),
            F.lit(0),
        ).alias("v_orphan"),
        F.count(F.when(F.col("lt_code") == 0, 1)).alias("nl_view"),
        F.count(F.when(F.col("lt_code") == 1, 1)).alias("nl_click"),
        F.coalesce(
            F.sum(F.when(F.col("lt_code") == 0, F.col("v"))), F.lit(0)
        ).alias("lt_view"),
        F.coalesce(
            F.sum(F.when(F.col("lt_code") == 1, F.col("v"))), F.lit(0)
        ).alias("lt_click"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n_t") > 0,
                    F.col("q") * F.col("n_view")
                    + F.when(F.col("ft_code") == 0, F.col("r")).otherwise(0),
                )
            ),
            F.lit(0),
        ).alias("lin_view"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n_t") > 0,
                    F.col("q") * (F.col("n_t") - F.col("n_view"))
                    + F.when(F.col("ft_code") == 1, F.col("r")).otherwise(0),
                )
            ),
            F.lit(0),
        ).alias("lin_click"),
    )
    rows = a.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("touch_type"),
                    F.col("nf_view").cast("bigint").alias("n_first"),
                    F.col("nl_view").cast("bigint").alias("n_last"),
                    F.col("ft_view").cast("bigint").alias("first_touch_cents"),
                    F.col("lt_view").cast("bigint").alias("last_touch_cents"),
                    F.col("lin_view").cast("bigint").alias("linear_cents"),
                ),
                F.struct(
                    F.lit("click").alias("touch_type"),
                    F.col("nf_click").cast("bigint").alias("n_first"),
                    F.col("nl_click").cast("bigint").alias("n_last"),
                    F.col("ft_click").cast("bigint").alias("first_touch_cents"),
                    F.col("lt_click").cast("bigint").alias("last_touch_cents"),
                    F.col("lin_click").cast("bigint").alias("linear_cents"),
                ),
                F.struct(
                    F.lit("(none)").alias("touch_type"),
                    F.col("n_orphan").cast("bigint").alias("n_first"),
                    F.col("n_orphan").cast("bigint").alias("n_last"),
                    F.col("v_orphan").cast("bigint").alias("first_touch_cents"),
                    F.col("v_orphan").cast("bigint").alias("last_touch_cents"),
                    F.col("v_orphan").cast("bigint").alias("linear_cents"),
                ),
            )
        ).alias("row")
    ).select("row.*")
    return rows.orderBy("touch_type")


# ---------------------------------------------------------------------------
# Survival analysis (round 8): tenure hazard curve
# ---------------------------------------------------------------------------


@register(
    "events_survival_hazard",
    oracle="""
    WITH span AS (
      SELECT user_id,
             datediff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
               AS lifespan
      FROM events GROUP BY user_id
    ),
    per_len AS (
      SELECT lifespan, COUNT(*) AS ended
      FROM span GROUP BY lifespan
    ),
    risk AS (
      SELECT lifespan AS tenure_day, ended,
             SUM(ended) OVER (ORDER BY lifespan DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS n_at_risk
      FROM per_len
    )
    SELECT CAST(tenure_day AS BIGINT) AS tenure_day,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(ended AS BIGINT) AS n_ended,
           CAST(ended * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
    FROM risk
    ORDER BY tenure_day
    """,
    tags=("events", "survival", "hazard", "analytics", "A-family"),
)
def events_survival_hazard(spark, sf_dir):
    """DISCRETE-TIME SURVIVAL HAZARD over user tenure — the churn
    curve: for each observed lifespan d (days between a user's first
    and last event), the risk set n_at_risk (users whose lifespan is
    >= d) and the hazard h(d) = ended(d) / n_at_risk(d) in exact
    integer ppm — the per-tenure-day churn probability a retention
    team reads before pricing interventions (the Kaplan-Meier
    estimator's ingredients; the survival product itself is a float
    chain, so the exact surface is the hazard table it derives from).
    Scale shape: one user-keyed aggregate reduces the event log to one
    row per user; everything after operates on the lifespan HISTOGRAM
    (rows = distinct lifespans, bounded by the calendar, not the
    corpus) — the reverse-cumulative risk set is the broadcast theta
    self-join over that tiny table (the lower_bucket_agg carry
    pattern, no SinglePartition window anywhere).  No per-user row
    survives the first aggregate."""
    e = table(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("lifespan")
    )
    per_len = span.groupBy("lifespan").agg(
        F.count(F.lit(1)).alias("ended")
    )
    other = per_len.select(
        F.col("lifespan").alias("__l2"), F.col("ended").alias("__e2")
    )
    risk = (
        per_len.join(
            F.broadcast(other), F.col("__l2") >= F.col("lifespan")
        )
        .groupBy(F.col("lifespan").alias("tenure_day"), "ended")
        .agg(F.sum("__e2").alias("n_at_risk"))
    )
    return risk.select(
        F.col("tenure_day").cast("bigint").alias("tenure_day"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("ended").cast("bigint").alias("n_ended"),
        F.expr("ended * 1000000 div n_at_risk")
        .cast("bigint")
        .alias("hazard_ppm"),
    ).orderBy("tenure_day")


# ---------------------------------------------------------------------------
# Conversion latency (round 8): signup -> first purchase
# ---------------------------------------------------------------------------


@register(
    "events_funnel_time_to_convert",
    oracle="""
    WITH signup AS (
      SELECT user_id, MIN(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id,
             MIN(e.ts_us) - s.s_us AS delay_us
      FROM signup s
      JOIN (SELECT user_id, epoch_us(ts) AS ts_us FROM events
            WHERE event_type = 'purchase') e
        ON e.user_id = s.user_id AND e.ts_us >= s.s_us
      GROUP BY s.user_id, s.s_us
    ),
    mins AS (SELECT user_id, delay_us // 60000000 AS delay_min FROM conv),
    ranked AS (
      SELECT delay_min,
             ROW_NUMBER() OVER (ORDER BY delay_min, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM mins
    ),
    picks AS (
      SELECT
        MAX(CASE WHEN rn = (n * 25 + 99) // 100 THEN delay_min END) AS p25,
        MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN delay_min END) AS p50,
        MAX(CASE WHEN rn = (n * 75 + 99) // 100 THEN delay_min END) AS p75,
        MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN delay_min END) AS p90,
        MAX(n) AS n_converted
      FROM ranked
    )
    SELECT CAST((SELECT COUNT(*) FROM signup) AS BIGINT) AS n_signed_up,
           CAST(n_converted AS BIGINT) AS n_converted,
           CAST(n_converted * 1000000
                // (SELECT COUNT(*) FROM signup) AS BIGINT)
             AS conversion_ppm,
           CAST(p25 AS BIGINT) AS p25_min,
           CAST(p50 AS BIGINT) AS p50_min,
           CAST(p75 AS BIGINT) AS p75_min,
           CAST(p90 AS BIGINT) AS p90_min
    FROM picks
    """,
    tags=("events", "funnel", "latency", "percentile", "analytics"),
)
def events_funnel_time_to_convert(spark, sf_dir):
    """CONVERSION-LATENCY DISTRIBUTION — signup → first subsequent
    purchase delay, summarized as conversion rate (exact ppm) plus
    EXACT p25/p50/p75/p90 of the delay in whole minutes, picked by
    integer rank (ceil(n·p/100), percentile_disc semantics) so no
    cross-engine interpolation drift can enter — the funnel-latency
    readout that sets nudge-campaign timing.  Scale shape: one
    user-keyed aggregate per stage (signup minimum, conditional
    purchase-after minimum via a user-keyed join both engines plan as
    one co-partitioned pass), then GLOBAL ranks over the
    converted-users delays via the two-pass prefix scan
    (operators/prefix.py:row_number_two_pass — no data-sized
    SinglePartition window); the ceil-rank pick reads 4 rows from the
    ranked delay column."""
    from lakehouse_cdc_spark.operators.prefix import row_number_two_pass

    e = table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    conv = (
        signup.join(purchases, "user_id")
        .filter(F.col("ts_us") >= F.col("s_us"))
        .groupBy("user_id", "s_us")
        .agg((F.min("ts_us") - F.col("s_us")).alias("delay_us"))
        .select("user_id", F.expr("delay_us div 60000000").alias("delay_min"))
    )
    n_conv = conv.agg(F.count(F.lit(1)).alias("n"))
    ranked = row_number_two_pass(
        conv, "delay_min", ["user_id"], "rn"
    ).crossJoin(F.broadcast(n_conv))
    picks = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n * 25 + 99) div 100"), F.col("delay_min"))
        ).alias("p25"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 50 + 99) div 100"), F.col("delay_min"))
        ).alias("p50"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 75 + 99) div 100"), F.col("delay_min"))
        ).alias("p75"),
        F.max(
            F.when(F.col("rn") == F.expr("(n * 90 + 99) div 100"), F.col("delay_min"))
        ).alias("p90"),
        F.max("n").alias("n_converted"),
    )
    n_signup = signup.agg(F.count(F.lit(1)).alias("n_signed_up"))
    return picks.crossJoin(F.broadcast(n_signup)).select(
        F.col("n_signed_up").cast("bigint").alias("n_signed_up"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        F.expr("n_converted * 1000000 div n_signed_up")
        .cast("bigint")
        .alias("conversion_ppm"),
        F.col("p25").cast("bigint").alias("p25_min"),
        F.col("p50").cast("bigint").alias("p50_min"),
        F.col("p75").cast("bigint").alias("p75_min"),
        F.col("p90").cast("bigint").alias("p90_min"),
    )


# ---------------------------------------------------------------------------
# Period-over-period and repeat-purchase analytics (round 8)
# ---------------------------------------------------------------------------


@register(
    "orders_period_over_period",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%Y%m') AS BIGINT) AS ym,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    shifted AS (
      SELECT ym, rev_cents, n_orders,
             LAG(rev_cents) OVER (ORDER BY ym) AS prev_rev,
             LAG(ym) OVER (ORDER BY ym) AS prev_ym,
             LAG(rev_cents, 12) OVER (ORDER BY ym) AS yoy_rev,
             LAG(ym, 12) OVER (ORDER BY ym) AS yoy_ym
      FROM monthly
    )
    SELECT ym, rev_cents, n_orders,
           CAST(CASE WHEN prev_ym = CASE WHEN ym % 100 = 1
                                         THEN ym - 89 ELSE ym - 1 END
                THEN (rev_cents - prev_rev) * 10000 // prev_rev
                END AS BIGINT) AS mom_bps,
           CAST(CASE WHEN yoy_ym = ym - 100
                THEN (rev_cents - yoy_rev) * 10000 // yoy_rev
                END AS BIGINT) AS yoy_bps
    FROM shifted ORDER BY ym
    """,
    tags=("orders", "analytics", "window", "period-over-period"),
)
def orders_period_over_period(spark, sf_dir):
    """MONTH-OVER-MONTH and YEAR-OVER-YEAR revenue growth with
    CALENDAR-ALIGNMENT GUARDS — the finance dashboard staple done
    honestly: a plain LAG is wrong whenever a month is missing from
    the data (it silently compares against the wrong period), so each
    delta validates the lagged row's actual ym before reporting
    (prev must be the true previous calendar month, yoy must be
    exactly ym−100) and emits NULL for unaligned gaps instead of a
    fabricated growth number.  Growth in exact integer basis points
    (floor division).  Scale: the window runs over the MONTHLY table
    (rows = months in history, calendar-bounded like the survival
    histogram) — the only corpus-sized work is the first groupBy."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyyMM").cast("bigint").alias("ym")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("rev_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    # months-in-history rows: a single-task window here is bounded by
    # the calendar (~80 rows over 7 years), not the corpus — same
    # contract as the survival-hazard histogram, but expressed through
    # a 1-bucket two-pass scan to keep the plan fence's invariant
    from lakehouse_cdc_spark.operators.prefix import row_number_two_pass

    ranked = row_number_two_pass(monthly, "ym", [], "rk")
    a = ranked.select(
        F.col("ym").alias("__ym2"),
        F.col("rev_cents").alias("__rev2"),
        F.col("rk").alias("__rk2"),
    )
    shifted = (
        ranked.join(
            F.broadcast(a.withColumnRenamed("__rk2", "__rk_prev")),
            F.col("__rk_prev") == F.col("rk") - 1,
            "left",
        )
        .withColumnsRenamed({"__ym2": "prev_ym", "__rev2": "prev_rev"})
        .join(
            F.broadcast(
                a.select(
                    F.col("__ym2").alias("yoy_ym"),
                    F.col("__rev2").alias("yoy_rev"),
                    (F.col("__rk2") + 12).alias("__rk_yoy"),
                )
            ),
            F.col("__rk_yoy") == F.col("rk"),
            "left",
        )
    )
    prev_aligned = F.col("prev_ym") == F.when(
        F.col("ym") % 100 == 1, F.col("ym") - 89
    ).otherwise(F.col("ym") - 1)
    yoy_aligned = F.col("yoy_ym") == F.col("ym") - 100
    return shifted.select(
        "ym",
        "rev_cents",
        "n_orders",
        F.when(
            prev_aligned,
            F.expr("(rev_cents - prev_rev) * 10000 div prev_rev"),
        )
        .cast("bigint")
        .alias("mom_bps"),
        F.when(
            yoy_aligned,
            F.expr("(rev_cents - yoy_rev) * 10000 div yoy_rev"),
        )
        .cast("bigint")
        .alias("yoy_bps"),
    ).orderBy("ym")


@register(
    "orders_repeat_purchase_curve",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey,
             CAST(strftime(MIN(o_orderdate), '%Y%m') AS BIGINT) AS cohort_ym,
             MIN(o_orderdate) AS d1
      FROM orders GROUP BY o_custkey
    ),
    seconds AS (
      SELECT o_custkey, o_orderdate AS d2 FROM ranked WHERE rn = 2
    )
    SELECT f.cohort_ym,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(s.o_custkey) AS BIGINT) AS n_repeat,
           CAST(COUNT(s.o_custkey) * 1000000 // COUNT(*) AS BIGINT)
             AS repeat_ppm,
           CAST(SUM(datediff('day', f.d1, s.d2)) AS BIGINT)
             AS sum_days_to_second
    FROM firsts f LEFT JOIN seconds s ON f.o_custkey = s.o_custkey
    GROUP BY f.cohort_ym ORDER BY f.cohort_ym
    """,
    tags=("orders", "analytics", "retention", "cohort"),
)
def orders_repeat_purchase_curve(spark, sf_dir):
    """REPEAT-PURCHASE rate by acquisition cohort — the retention
    readout on the ORDERS axis (events_retention_cohorts' commerce
    twin): per first-order month, how many customers ever ordered a
    second time (exact ppm) and the total days between first and
    second order (exact integer sum — the mean is one division away
    and the sum stays hash-checkable).  One customer-keyed window
    ranks each customer's orders; firsts and seconds are two cheap
    derivations of it.  Scale: everything is keyed by o_custkey until
    the final cohort rollup (|months| rows); the window and both
    aggregates reuse one hash partitioning."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    )
    firsts = o.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyyMM")
        .cast("bigint")
        .alias("cohort_ym"),
        F.min("o_orderdate").alias("d1"),
    )
    seconds = ranked.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("__ck2"), F.col("o_orderdate").alias("d2")
    )
    j = firsts.join(seconds, firsts.o_custkey == F.col("__ck2"), "left")
    return (
        j.groupBy("cohort_ym")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.count("__ck2").cast("bigint").alias("n_repeat"),
            F.expr("count(__ck2) * 1000000 div count(*)")
            .cast("bigint")
            .alias("repeat_ppm"),
            F.sum(F.datediff("d2", "d1")).cast("bigint").alias(
                "sum_days_to_second"
            ),
        )
        .orderBy("cohort_ym")
    )


@register(
    "window_session_tvf",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_tus
      FROM events
    ),
    numbered AS (
      SELECT user_id, event_id, tus, v,
             SUM(CASE WHEN prev_tus IS NULL
                           OR tus - prev_tus > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_idx
      FROM seq
    ),
    sessions AS (
      SELECT user_id, sess_idx,
             MIN(tus) AS session_start_us,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(v) AS BIGINT) AS value_cents
      FROM numbered GROUP BY user_id, sess_idx
    )
    SELECT user_id, CAST(session_start_us AS BIGINT) AS session_start_us,
           n_events, value_cents
    FROM sessions ORDER BY user_id, session_start_us
    """,
    tags=("events", "sessionization", "tvf", "T7"),
)
def window_session_tvf(spark, sf_dir):
    """Spark's native ``session_window`` TVF in BATCH mode — the same
    operator the streaming sessionizer uses (streaming/stateful.py),
    here proven EQUIVALENT to the hand-built gaps-and-islands window
    algebra: the oracle replays events_sessionize_batch's lag/
    running-sum construction, and the hash must match Spark's built-in
    session assignment (same 30-minute gap).  The TVF closes a session
    when the NEXT event is more than the gap away, exactly the
    lag-based open rule — an off-by-one in either boundary convention
    breaks every session start.  Session start is reported in exact
    epoch-µs.  Scale: session_window plans as one user-keyed exchange
    + a session-merging aggregate, the same single-shuffle shape as
    the manual form — this row certifies the built-in can replace the
    window algebra wherever the engine's users prefer TVF syntax."""
    e = table(spark, sf_dir, "events")
    grouped = (
        e.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("value_cents"),
            F.min(F.unix_micros("ts")).alias("session_start_us"),
        )
    )
    return grouped.select(
        "user_id",
        F.col("session_start_us").cast("bigint").alias("session_start_us"),
        "n_events",
        "value_cents",
    ).orderBy("user_id", "session_start_us")


# ---------------------------------------------------------------------------
# Bot / automation signature (round 8): curation's traffic filter
# ---------------------------------------------------------------------------


@register(
    "events_bot_signature",
    oracle="""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS tus,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    gaps AS (
      SELECT user_id, gap_us,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_us) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS ng
      FROM seq WHERE gap_us IS NOT NULL
    ),
    med AS (
      SELECT user_id, gap_us AS median_gap_us
      FROM gaps WHERE rn = (ng + 1) // 2
    ),
    feats AS (
      SELECT e.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT EXTRACT(hour FROM ts)) AS BIGINT)
               AS active_hours,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
      FROM events e GROUP BY e.user_id
    )
    SELECT f.user_id, f.n_events, f.active_hours, f.active_days,
           CAST(m.median_gap_us AS BIGINT) AS median_gap_us,
           CAST(CASE WHEN m.median_gap_us <= 600000000
                          AND f.active_hours >= 20
                     THEN 1 ELSE 0 END AS BIGINT) AS bot_flag
    FROM feats f JOIN med m ON f.user_id = m.user_id
    ORDER BY f.user_id
    """,
    tags=("events", "bot-detection", "curation", "window"),
)
def events_bot_signature(spark, sf_dir):
    """AUTOMATION-SIGNATURE features per user — the traffic filter a
    training-data pipeline runs before user-generated text is
    trusted: humans sleep and hesitate, bots fire around the clock at
    machine cadence.  Features: exact MEDIAN inter-event gap (rank
    pick ceil(n/2) within each user's own gap sequence — no
    interpolation, no global sort), distinct active hours-of-day,
    active days, event count; the flag fires on sub-10-minute median
    cadence sustained across >=20 distinct hours.  Scale shape: the
    lag, the per-user gap ranking, and the census all reuse ONE
    user_id hash partitioning; output is one row per user with >=2
    events."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    )
    wg = Window.partitionBy("user_id").orderBy("gap_us")
    wc = Window.partitionBy("user_id")
    gaps = (
        seq.filter(F.col("gap_us").isNotNull())
        .select(
            "user_id",
            "gap_us",
            F.row_number().over(wg).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("ng"),
        )
    )
    med = gaps.filter(
        F.col("rn") == F.expr("(ng + 1) div 2")
    ).select("user_id", F.col("gap_us").alias("median_gap_us"))
    feats = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct(F.hour("ts")).cast("bigint").alias("active_hours"),
        F.countDistinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("active_days"),
    )
    return (
        feats.join(med, "user_id")
        .select(
            "user_id",
            "n_events",
            "active_hours",
            "active_days",
            F.col("median_gap_us").cast("bigint").alias("median_gap_us"),
            F.when(
                (F.col("median_gap_us") <= 600_000_000)
                & (F.col("active_hours") >= 20),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("bot_flag"),
        )
        .orderBy("user_id")
    )


@register(
    "window_topk_with_ties",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER w AS rk,
             ROW_NUMBER() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC)
    )
    SELECT CAST(COUNT(CASE WHEN rk <= 3 THEN 1 END) AS BIGINT)
             AS kept_with_ties,
           CAST(COUNT(CASE WHEN rn <= 3 THEN 1 END) AS BIGINT)
             AS kept_row_number,
           CAST(COUNT(CASE WHEN rk <= 3 AND rn > 3 THEN 1 END) AS BIGINT)
             AS tie_overflow,
           CAST(bit_xor(CASE WHEN rk <= 3 THEN o_orderkey ELSE 0 END)
                AS BIGINT) AS kept_ids_xor
    FROM ranked
    """,
    tags=("window", "topk", "ties", "semantics", "W-family"),
)
def window_topk_with_ties(spark, sf_dir):
    """TOP-K WITH TIES vs WITHOUT — the executed contract between
    RANK (SQL:2008 FETCH FIRST k ROWS WITH TIES) and ROW_NUMBER
    top-k: rank()<=k keeps every row tied with the k-th (deterministic
    regardless of partitioning — no arbitrary tie victim), row_number
    keeps exactly k with an arbitrary-but-ordered winner.  The
    tie_overflow census counts rows that a WITH TIES reader gets and a
    row_number reader silently loses — on money rounded to cents, ties
    are common enough to matter for audit reproducibility.  The XOR
    digest pins the exact WITH-TIES membership (a tie-break divergence
    between engines breaks it; the rank key is the exact cents
    integer, so there is no float-equality ambiguity).  One
    customer-keyed window pass; Spark plans rank<=k as
    WindowGroupLimit at scale."""
    o = table(spark, sf_dir, "orders")
    key = F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    w = Window.partitionBy("o_custkey").orderBy(key.desc())
    ranked = o.select(
        "o_orderkey",
        F.rank().over(w).alias("rk"),
        F.row_number().over(w).alias("rn"),
    )
    return ranked.agg(
        F.count(F.when(F.col("rk") <= 3, 1))
        .cast("bigint")
        .alias("kept_with_ties"),
        F.count(F.when(F.col("rn") <= 3, 1))
        .cast("bigint")
        .alias("kept_row_number"),
        F.count(F.when((F.col("rk") <= 3) & (F.col("rn") > 3), 1))
        .cast("bigint")
        .alias("tie_overflow"),
        F.expr("bit_xor(CASE WHEN rk <= 3 THEN o_orderkey ELSE 0 END)")
        .cast("bigint")
        .alias("kept_ids_xor"),
    )


# ---------------------------------------------------------------------------
# Point-in-time feature snapshot (round 8): the feature-store operator
# ---------------------------------------------------------------------------

_FS_LOOKBACK_US = 7 * 86_400_000_000


@register(
    "events_feature_snapshot_pit",
    bench=True,
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    framed AS (
      SELECT user_id, event_id, event_type, tus,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
               AS f_views_7d,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
               AS f_clicks_7d,
             SUM(CASE WHEN event_type = 'purchase' THEN v ELSE 0 END) OVER w
               AS f_spend_7d_cents,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w
               AS f_errors_7d,
             MIN(CASE WHEN event_type = 'signup' THEN tus END)
               OVER (PARTITION BY user_id ORDER BY tus
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS signup_tus
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN {_FS_LOOKBACK_US} PRECEDING
                   AND 1 PRECEDING)
    ),
    labels AS (
      SELECT event_id AS label_event_id, user_id,
             COALESCE(f_views_7d, 0) AS f_views_7d,
             COALESCE(f_clicks_7d, 0) AS f_clicks_7d,
             COALESCE(f_spend_7d_cents, 0) AS f_spend_7d_cents,
             COALESCE(f_errors_7d, 0) AS f_errors_7d,
             CASE WHEN signup_tus IS NOT NULL
                  THEN (tus - signup_tus) // 86400000000 END
               AS f_tenure_days
      FROM framed WHERE event_type = 'purchase'
    )
    SELECT label_event_id, user_id,
           CAST(f_views_7d AS BIGINT) AS f_views_7d,
           CAST(f_clicks_7d AS BIGINT) AS f_clicks_7d,
           CAST(f_spend_7d_cents AS BIGINT) AS f_spend_7d_cents,
           CAST(f_errors_7d AS BIGINT) AS f_errors_7d,
           CAST(f_tenure_days AS BIGINT) AS f_tenure_days
    FROM labels ORDER BY label_event_id
    """,
    tags=("events", "feature-store", "point-in-time", "leakage", "W-family"),
)
def events_feature_snapshot_pit(spark, sf_dir):
    """POINT-IN-TIME FEATURE SNAPSHOT — the feature-store operator
    that makes training data leakage-safe: for every label event
    (purchase), each feature is computed over STRICTLY-BEFORE data
    only (trailing-7-day view/click counts, spend, error count via a
    RANGE frame ending at −1; tenure via the first prior signup) — a
    feature computed over [t−7d, t] instead of [t−7d, t) leaks the
    label into itself, the bug point-in-time joins exist to prevent
    (every feature-store's core contract).  All five features ride
    ONE user-keyed window exchange over the interleaved event
    sequence — no per-feature as-of join, no label×history fan-out;
    adding features adds frame aggregates, never shuffles.  Exact
    integers throughout (cents, whole days).  At 100 TB this is the
    nightly training-snapshot job: output one row per label with its
    features as of the label's own timestamp."""
    e = table(spark, sf_dir, "events")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-_FS_LOOKBACK_US, -1)
    )
    # RANGE, not ROWS: with tied timestamps a ROWS frame's peer order is
    # engine/run-dependent, so a same-microsecond signup may or may not
    # land inside the frame — RANGE excludes ALL peers of the current
    # value, preserving both the strictly-before contract and
    # cross-engine hash determinism (the four 7-day features already
    # use tie-safe RANGE frames).
    w_all = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    framed = seq.select(
        "user_id",
        "event_id",
        "event_type",
        "tus",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w)
        .alias("f_views_7d"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .alias("f_clicks_7d"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("v")).otherwise(0)
        )
        .over(w)
        .alias("f_spend_7d_cents"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w)
        .alias("f_errors_7d"),
        F.min(
            F.when(F.col("event_type") == "signup", F.col("tus"))
        )
        .over(w_all)
        .alias("signup_tus"),
    )
    return (
        framed.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("label_event_id"),
            "user_id",
            F.coalesce("f_views_7d", F.lit(0)).cast("bigint").alias("f_views_7d"),
            F.coalesce("f_clicks_7d", F.lit(0))
            .cast("bigint")
            .alias("f_clicks_7d"),
            F.coalesce("f_spend_7d_cents", F.lit(0))
            .cast("bigint")
            .alias("f_spend_7d_cents"),
            F.coalesce("f_errors_7d", F.lit(0))
            .cast("bigint")
            .alias("f_errors_7d"),
            F.when(
                F.col("signup_tus").isNotNull(),
                F.expr("(tus - signup_tus) div 86400000000"),
            )
            .cast("bigint")
            .alias("f_tenure_days"),
        )
        .orderBy("label_event_id")
    )


# ---------------------------------------------------------------------------
# Event-type Markov transition matrix (round 9)
# ---------------------------------------------------------------------------

_MK_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_markov_transition",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
      FROM events
    ),
    pairs AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY tus, event_id) AS prev_t,
             event_type AS next_t
      FROM seq
    ),
    counts AS (
      SELECT prev_t,
             CAST(COUNT(*) AS BIGINT) AS n_out,
             {", ".join(
               f"CAST(SUM(CASE WHEN next_t = '{t}' THEN 1 ELSE 0 END) "
               f"AS BIGINT) AS n_{t}" for t in _MK_TYPES)}
      FROM pairs WHERE prev_t IS NOT NULL GROUP BY prev_t
    )
    SELECT prev_t, n_out,
           {", ".join(
             f"n_{t}, CAST(CAST(n_{t} AS HUGEINT) * 1000000 // n_out "
             f"AS BIGINT) AS p_{t}_ppm" for t in _MK_TYPES)}
    FROM counts ORDER BY prev_t
    """,
    tags=("events", "markov", "journey", "W-family"),
)
def events_markov_transition(spark, sf_dir):
    """EVENT-TYPE MARKOV TRANSITION MATRIX — the user-journey model
    behind "what happens after an error?": consecutive event pairs per
    user (ONE user-keyed window pass, total order = (timestamp,
    event_id) so ties can't flip a transition between engines) roll up
    to the 5×5 transition-count matrix with exact row-stochastic
    probabilities in integer ppm.  The matrix IS the first-order
    journey model: error→churn reads straight off the error row, and
    the same pairs table feeds any higher-order extension by widening
    the lag.

    Scale shape: one window exchange on the user hash (per-user
    histories are the parallelism unit — the sessionization posture),
    then a |types|-row aggregate whose columns, not rows, grow with
    the alphabet.  At 100 TB the cost is the one exchange."""
    e = table(spark, sf_dir, "events")
    seq = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    pairs = seq.select(
        F.lag("event_type").over(w).alias("prev_t"),
        F.col("event_type").alias("next_t"),
    ).filter(F.col("prev_t").isNotNull())
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_out")]
    for t in _MK_TYPES:
        aggs.append(
            F.sum(F.when(F.col("next_t") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
        )
    counts = pairs.groupBy("prev_t").agg(*aggs)
    out_cols = ["prev_t", "n_out"]
    for t in _MK_TYPES:
        out_cols.append(f"n_{t}")
        counts = counts.withColumn(
            f"p_{t}_ppm",
            (
                F.col(f"n_{t}").cast("decimal(38,0)")
                * F.lit(1000000).cast("decimal(38,0)")
                / F.col("n_out").cast("decimal(38,0)")
            ).cast("bigint"),
        )
        out_cols.append(f"p_{t}_ppm")
    return counts.select(*out_cols).orderBy("prev_t")


_CW_WINDOWS_H = (1, 6, 24, 72, 168)  # conversion-window sweep (hours)


@register(
    "events_conversion_window_sweep",
    oracle=f"""
    WITH signup AS (
      SELECT user_id, MIN(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id, MIN(e.ts_us) - s.s_us AS delay_us
      FROM signup s
      JOIN (SELECT user_id, epoch_us(ts) AS ts_us FROM events
            WHERE event_type = 'purchase') e
        ON e.user_id = s.user_id AND e.ts_us >= s.s_us
      GROUP BY s.user_id, s.s_us
    ),
    wins AS (SELECT unnest(ARRAY{list(_CW_WINDOWS_H)}) AS w_hours),
    tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_signed FROM signup)
    SELECT w.w_hours,
           CAST(t.n_signed AS BIGINT) AS n_signed_up,
           CAST(COUNT(CASE WHEN c.delay_us
                           < CAST(w.w_hours AS HUGEINT) * 3600000000
                           THEN 1 END) AS BIGINT) AS n_converted,
           CAST(CAST(COUNT(CASE WHEN c.delay_us
                                < CAST(w.w_hours AS HUGEINT) * 3600000000
                                THEN 1 END) AS HUGEINT)
                * 1000000 // t.n_signed AS BIGINT) AS conversion_ppm
    FROM wins w CROSS JOIN tot t LEFT JOIN conv c ON TRUE
    GROUP BY w.w_hours, t.n_signed
    ORDER BY w.w_hours
    """,
    tags=("events", "funnel", "conversion", "analytics", "A-family"),
)
def events_conversion_window_sweep(spark, sf_dir):
    """CONVERSION-WINDOW OPERATING CURVE — what attribution window
    should this funnel use?  The same first-signup→first-purchase
    delays as events_funnel_time_to_convert, swept against five
    candidate windows (1h … 7d) in ONE pass: each row reports the
    window, converters inside it, and the exact ppm conversion rate
    against ALL signed-up users — the saturating curve whose knee is
    the defensible attribution-window choice (a rate that barely
    moves from 24h to 72h says the 7-day default is vanity).  The
    sweep is a tiny literal-array cross join over the |users|-row
    delay table: adding windows costs nothing, the delays are
    computed once.

    Scale shape: two user-keyed aggregates (first signup, first
    qualifying purchase via one join on the user hash), then a
    5×|converters| broadcast expansion collapsed immediately — the
    delay table is the only data-sized intermediate, built once."""
    e = table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
    )
    conv = (
        signup.join(
            e.filter(F.col("event_type") == "purchase").select(
                "user_id", F.unix_micros("ts").alias("ts_us")
            ),
            "user_id",
        )
        .filter(F.col("ts_us") >= F.col("s_us"))
        .groupBy("user_id", "s_us")
        .agg((F.min("ts_us") - F.col("s_us")).alias("delay_us"))
        .select("delay_us")
    )
    tot = signup.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_signed")
    )
    # explode of the literal window array over the delay table: the
    # 5× expansion collapses in the same stage's partial aggregate
    expanded = conv.select(
        "delay_us",
        F.explode(F.array(*[F.lit(h) for h in _CW_WINDOWS_H])).alias(
            "w_hours"
        ),
    )
    counts = expanded.groupBy("w_hours").agg(
        F.sum(
            F.when(
                F.col("delay_us")
                < F.col("w_hours").cast("bigint") * F.lit(3600000000),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_converted")
    )
    # the window AXIS is a literal 5-row frame, independent of conv:
    # on conversion-free data the exploded counts are EMPTY, but the
    # sweep must still report every candidate window with 0 converters
    # (the oracle's wins CROSS JOIN tot always yields 5 rows)
    wins = spark.createDataFrame(
        [(int(h),) for h in _CW_WINDOWS_H], "w_hours int"
    )
    counts = wins.join(F.broadcast(counts), "w_hours", "left").select(
        "w_hours",
        F.coalesce(F.col("n_converted"), F.lit(0).cast("bigint")).alias(
            "n_converted"
        ),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("w_hours").cast("bigint").alias("w_hours"),
            F.col("n_signed").cast("bigint").alias("n_signed_up"),
            "n_converted",
            (
                F.col("n_converted").cast("decimal(38,0)")
                * F.lit(1000000).cast("decimal(38,0)")
                / F.col("n_signed")
            )
            .cast("bigint")
            .alias("conversion_ppm"),
        )
        .orderBy("w_hours")
    )

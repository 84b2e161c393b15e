"""Validation-family declared queries (SURVEY §5 / validation.py).

Target drift is simulated deterministically from the customer table:
keys ≡ 0 (mod 97) are missing from the target, and keys ≡ 0 (mod 31)
carry a corrupted balance — so every check has real work to do and an
exact oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table
from lakehouse_cdc_spark.quality.validation import (
    freshness_lag,
    missing_keys,
    row_count_diff,
    sample_match_rate,
)

_TARGET_SQL = """
    SELECT c_custkey,
           CASE WHEN c_custkey % 31 = 0 THEN c_acctbal + 1.0
                ELSE c_acctbal END AS c_acctbal
    FROM customer
    WHERE c_custkey % 97 != 0
"""


def _drifted_target(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 31 == 0, F.col("c_acctbal") + 1.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )


@register(
    "validation_rowcount",
    oracle=f"""
    WITH t AS ({_TARGET_SQL})
    SELECT (SELECT COUNT(*) FROM customer) AS source_cnt,
           (SELECT COUNT(*) FROM t) AS target_cnt,
           CAST(abs((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM t)) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE) AS diff_pct,
           (CAST(abs((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM t)) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE)) <= 0.001 AS within_tolerance
    """,
    tags=("validation", "A1"),
)
def validation_rowcount(spark, sf_dir):
    """Row-count equality within 0.1% tolerance (validation.py:209-258)
    — the drifted target must trip the tolerance flag."""
    return row_count_diff(
        table(spark, sf_dir, "customer"), _drifted_target(spark, sf_dir)
    )


@register(
    "validation_missing_keys",
    oracle=f"""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM ({_TARGET_SQL}))
    """,
    tags=("validation", "J3"),
)
def validation_missing_keys(spark, sf_dir):
    """Keys lost in replication, found with one anti-join instead of
    the reference's per-key collect() probe loop (validation.py:389-410)."""
    return missing_keys(
        table(spark, sf_dir, "customer"),
        _drifted_target(spark, sf_dir),
        keys=["c_custkey"],
    )


@register(
    "validation_sample_match",
    oracle=f"""
    WITH t AS ({_TARGET_SQL}),
    s AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 10 = 0)
    SELECT COUNT(*) AS sampled,
           CAST(SUM(CASE WHEN t.c_acctbal = s.c_acctbal THEN 1 ELSE 0 END) AS BIGINT) AS matched,
           CAST(SUM(CASE WHEN t.c_acctbal = s.c_acctbal THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS match_rate
    FROM s LEFT JOIN t ON s.c_custkey = t.c_custkey
    """,
    tags=("validation", "A1", "J1"),
)
def validation_sample_match(spark, sf_dir):
    """Deterministic-sample value comparison (validation.py:329-437's
    ≥99% check, reproducible sample instead of ORDER BY RANDOM())."""
    return sample_match_rate(
        table(spark, sf_dir, "customer"),
        _drifted_target(spark, sf_dir),
        keys=["c_custkey"],
        compare_cols=["c_acctbal"],
        sample_pred=F.col("c_custkey") % 10 == 0,
    )


@register(
    "validation_freshness_lag",
    oracle="""
    WITH g AS (SELECT max(ts) AS global_max FROM events)
    SELECT event_type,
           date_diff('second', max(ts), (SELECT global_max FROM g)) AS lag_s
    FROM events
    GROUP BY event_type
    """,
    tags=("validation", "T8"),
)
def validation_freshness_lag(spark, sf_dir):
    """Per-group freshness lag behind the newest event — the
    end-to-end lag measure (validation.py:506-618) without collecting
    rows to the driver."""
    return freshness_lag(
        table(spark, sf_dir, "events"), "ts", group_cols=["event_type"]
    )


@register(
    "maintenance_partition_health",
    oracle="""
    WITH p AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) AS cnt
      FROM events GROUP BY 1
    )
    SELECT COUNT(*) AS partition_cnt,
           CAST(MIN(cnt) AS BIGINT) AS min_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_rows,
           CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_rows,
           CAST(SUM(CASE WHEN cnt < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS small_partitions
    FROM p
    """,
    tags=("validation", "A4", "A5", "maintenance"),
)
def maintenance_partition_health(spark, sf_dir):
    """Partition-balance health stats (validation.py:780-796: min/max/
    avg rows per partition + small-partition count, threshold 1000)."""
    e = table(spark, sf_dir, "events")
    per_part = e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return per_part.agg(
        F.count(F.lit(1)).alias("partition_cnt"),
        F.min("cnt").cast("bigint").alias("min_rows"),
        F.max("cnt").cast("bigint").alias("max_rows"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_rows"
        ),
        F.sum((F.col("cnt") < 1000).cast("long")).cast("bigint").alias(
            "small_partitions"
        ),
    )


_SUITE_TARGET_SQL = """
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 37 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate
    FROM orders
"""


def _suite_target(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 37 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
    )


@register(
    "validation_suite",
    oracle=f"""
    WITH t AS ({_SUITE_TARGET_SQL}),
    rc AS (
      SELECT (CAST(abs((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM t)) AS DOUBLE)
              / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE)) <= 0.001 AS row_count_ok
    ),
    per_key AS (
      SELECT s.o_orderkey,
             MIN(CASE WHEN s.o_totalprice IS NOT DISTINCT FROM t.o_totalprice
                      THEN 1 ELSE 0 END) AS key_match
      FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 50 = 0) s
      LEFT JOIN t ON s.o_orderkey = t.o_orderkey
      GROUP BY s.o_orderkey
    ),
    sm AS (
      SELECT COALESCE(CAST(SUM(key_match) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) >= 0.99,
                      FALSE) AS sampling_ok
      FROM per_key
    ),
    mk AS (
      SELECT COUNT(*) <= 0 AS missing_ok
      FROM (SELECT o_orderkey FROM orders
            EXCEPT SELECT o_orderkey FROM t) m
    ),
    nk AS (SELECT SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS nullkeys_ok FROM t),
    fr AS (
      SELECT (CAST(epoch(CAST((SELECT MAX(o_orderdate) FROM orders) AS TIMESTAMP)) AS BIGINT)
              - CAST(epoch(CAST((SELECT MAX(o_orderdate) FROM t) AS TIMESTAMP)) AS BIGINT)) <= 0
             AS fresh_ok
    )
    SELECT row_count_ok, sampling_ok, missing_ok, nullkeys_ok, fresh_ok,
           5 AS n_checks,
           ((CASE WHEN row_count_ok THEN 1 ELSE 0 END)
            + (CASE WHEN sampling_ok THEN 1 ELSE 0 END)
            + (CASE WHEN missing_ok THEN 1 ELSE 0 END)
            + (CASE WHEN nullkeys_ok THEN 1 ELSE 0 END)
            + (CASE WHEN fresh_ok THEN 1 ELSE 0 END)) AS n_passed,
           CAST((CASE WHEN row_count_ok THEN 1 ELSE 0 END)
            + (CASE WHEN sampling_ok THEN 1 ELSE 0 END)
            + (CASE WHEN missing_ok THEN 1 ELSE 0 END)
            + (CASE WHEN nullkeys_ok THEN 1 ELSE 0 END)
            + (CASE WHEN fresh_ok THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 / 5.0 AS success_rate,
           CASE WHEN ((CASE WHEN row_count_ok THEN 1 ELSE 0 END)
            + (CASE WHEN sampling_ok THEN 1 ELSE 0 END)
            + (CASE WHEN missing_ok THEN 1 ELSE 0 END)
            + (CASE WHEN nullkeys_ok THEN 1 ELSE 0 END)
            + (CASE WHEN fresh_ok THEN 1 ELSE 0 END)) * 100.0 / 5.0 >= 95.0 THEN 'Good'
                WHEN ((CASE WHEN row_count_ok THEN 1 ELSE 0 END)
            + (CASE WHEN sampling_ok THEN 1 ELSE 0 END)
            + (CASE WHEN missing_ok THEN 1 ELSE 0 END)
            + (CASE WHEN nullkeys_ok THEN 1 ELSE 0 END)
            + (CASE WHEN fresh_ok THEN 1 ELSE 0 END)) * 100.0 / 5.0 >= 80.0 THEN 'Warning'
                ELSE 'Poor' END AS overall_status
    FROM rc, sm, mk, nk, fr
    """,
    tags=("validation", "suite"),
)
def validation_suite(spark, sf_dir):
    """The reference's run_validation_suite (validation.py:834-937) as
    ONE DataFrame: five source-vs-target checks cross-joined into a
    single verdict row with success-rate grading (Good >=95% /
    Warning >=80% / Poor).  The deterministic drift (o_totalprice
    corrupted on orderkey % 37 == 0) fails exactly the sampling check
    (sample: orderkey % 50 == 0, explicit predicate so the oracle can
    mirror it) -> 4/5 = 80% -> Warning, proving the grading boundary."""
    from lakehouse_cdc_spark.quality.validation import run_suite

    source = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    return run_suite(
        source,
        _suite_target(spark, sf_dir),
        keys=["o_orderkey"],
        compare_cols=["o_totalprice"],
        ts_col="o_orderdate",
        sample_pred=F.col("o_orderkey") % 50 == 0,
    )


_DRIFT_W = 2_000_000  # $20k buckets in price cents


@register(
    "validation_distribution_drift",
    oracle=f"""
    WITH base AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // {_DRIFT_W}
               AS bucket,
             CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr
      FROM orders
      WHERE CAST(strftime(o_orderdate, '%Y') AS BIGINT) IN (1995, 1996)
    ),
    cells AS (
      SELECT bucket,
             CAST(COUNT(*) FILTER (WHERE yr = 1995) AS BIGINT) AS cnt_a,
             CAST(COUNT(*) FILTER (WHERE yr = 1996) AS BIGINT) AS cnt_b
      FROM base GROUP BY bucket
    ),
    ns AS (
      SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM cells
    ),
    scored AS (
      SELECT c.bucket, c.cnt_a, c.cnt_b,
             abs(c.cnt_a * ns.nb - c.cnt_b * ns.na) AS tv_num,
             2 * ns.na * ns.nb AS tv_den
      FROM cells c, ns
    )
    -- shares as EXACT integer ppm (num*1e6 div den): rounded doubles
    -- tie-break differently across DuckDB versions, and the raw
    -- ratio column would be HUGEINT/float drift — integers only
    SELECT bucket, cnt_a, cnt_b,
           CAST(tv_num AS BIGINT) AS tv_num,
           CAST(tv_den AS BIGINT) AS tv_den,
           CAST(tv_num * 1000000 // tv_den AS BIGINT) AS tv_share_ppm,
           CAST(SUM(tv_num) OVER () AS BIGINT) AS tv_num_total,
           CAST(SUM(tv_num) OVER () * 1000000 // MAX(tv_den) OVER ()
                AS BIGINT) AS tv_distance_ppm
    FROM scored
    ORDER BY bucket
    """,
    tags=("validation", "drift", "data-quality"),
)
def validation_distribution_drift(spark, sf_dir):
    """Distribution-drift monitor between two periods (1995 vs 1996
    order-value histograms): per-bucket counts plus the total
    variation distance TV = 1/2 * sum |p_i - q_i|, computed as EXACT
    integer rationals — the per-bucket numerator |cnt_a*nb - cnt_b*na|
    over denominator 2*na*nb — so the drift score is bit-identical
    across engines (no float accumulation order to disagree on; the
    shares surface as exact integer ppm, never as rounded doubles —
    round(double, n) half-ties drift across DuckDB versions and
    HUGEINT ratio columns decay to float64 on Arrow fetch).
    This is the data-quality gate a training pipeline runs between
    ingest snapshots before accepting a refresh.  One map-side-combined
    aggregation into ~60 (bucket x period) cells: constant state,
    mergeable, the same scan shape at any corpus size."""
    base = table(spark, sf_dir, "orders").select(
        F.expr(
            f"CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div {_DRIFT_W}"
        ).alias("bucket"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    ).filter(F.col("yr").isin(1995, 1996))
    cells = base.groupBy("bucket").agg(
        F.count(F.when(F.col("yr") == 1995, 1)).alias("cnt_a"),
        F.count(F.when(F.col("yr") == 1996, 1)).alias("cnt_b"),
    )
    ns = cells.agg(
        F.sum("cnt_a").alias("na"), F.sum("cnt_b").alias("nb")
    )
    scored = cells.crossJoin(F.broadcast(ns)).select(
        "bucket",
        "cnt_a",
        "cnt_b",
        F.abs(F.col("cnt_a") * F.col("nb") - F.col("cnt_b") * F.col("na")).alias(
            "tv_num"
        ),
        (F.lit(2) * F.col("na") * F.col("nb")).alias("tv_den"),
    )
    # the all-rows total rides a tiny aggregate broadcast back onto
    # the cells instead of an empty-partition window (which plans the
    # same SinglePartition funnel as an unpartitioned ordered window)
    totals = scored.agg(
        F.sum("tv_num").cast("bigint").alias("tv_num_total"),
        F.max("tv_den").alias("__td"),
    )
    return (
        scored.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "cnt_a",
            "cnt_b",
            "tv_num",
            "tv_den",
            # ppm multiplies in DECIMAL(38,0): tv_num grows as na*nb,
            # so tv_num * 1e6 passes int64 around sf ~13 — Spark
            # (non-ANSI) would wrap silently while the oracle's
            # HUGEINT operands stay exact (the er_queries class)
            F.expr(
                "CAST(CAST(tv_num AS DECIMAL(38,0)) * 1000000"
                " div tv_den AS BIGINT)"
            ).alias("tv_share_ppm"),
            "tv_num_total",
            F.expr(
                "CAST(CAST(tv_num_total AS DECIMAL(38,0)) * 1000000"
                " div __td AS BIGINT)"
            ).alias("tv_distance_ppm"),
        )
        .orderBy("bucket")
    )


@register(
    "validation_benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS nt FROM obs),
    -- Benford P(d) = log10(1 + 1/d), pre-scaled to exact millionths so
    -- no engine evaluates a logarithm at query time
    expect AS (
      SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
                            (4, 96910), (5, 79181), (6, 66947),
                            (7, 57992), (8, 51153), (9, 45757))
        t(d, p_ppm)
    )
    SELECT e.d AS first_digit, COALESCE(o.n, 0) AS observed,
           e.p_ppm AS benford_ppm,
           CAST(COALESCE(o.n, 0) * 1000000 // t.nt AS BIGINT) AS observed_ppm,
           abs(CAST(COALESCE(o.n, 0) * 1000000 // t.nt AS BIGINT) - e.p_ppm)
             AS abs_dev_ppm
    FROM expect e LEFT JOIN obs o ON o.d = e.d, tot t
    ORDER BY e.d
    """,
    tags=("validation", "benford", "data-quality"),
)
def validation_benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit audit of order values — the fraud /
    synthetic-data screen auditors run on financial columns: the
    leading digit of naturally-occurring amounts follows
    P(d) = log10(1 + 1/d), and systematic deviation flags fabricated
    or truncated data.  The expected distribution is embedded as
    EXACT pre-computed millionths, so no engine evaluates a log at
    query time, and observed shares use integer floor-division per
    digit — every output column is a bigint both engines agree on.
    One map-side-combined 9-cell aggregate: constant state at any
    corpus size (and on THIS synthetic fixture the deviation columns
    correctly expose that o_totalprice is uniform, not Benford —
    which is exactly what the screen is for)."""
    digits = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("bigint")
            .alias("d")
        )
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("nt"))
    benford = spark.createDataFrame(
        [(1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
         (6, 66947), (7, 57992), (8, 51153), (9, 45757)],
        "d long, p_ppm long",
    )
    return (
        benford.join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.coalesce(F.col("n"), F.lit(0)).alias("observed"),
            F.col("p_ppm").alias("benford_ppm"),
            F.expr("COALESCE(n, 0) * 1000000 div nt").alias("observed_ppm"),
            F.abs(
                F.expr("COALESCE(n, 0) * 1000000 div nt") - F.col("p_ppm")
            ).alias("abs_dev_ppm"),
        )
        .orderBy("first_digit")
    )


@register(
    "validation_key_gap_islands",
    oracle="""
    WITH ks AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    lagged AS (
      SELECT k, LAG(k) OVER (ORDER BY k) AS prev_k FROM ks
    ),
    gaps AS (
      SELECT prev_k + 1 AS gap_start, k - 1 AS gap_end,
             k - prev_k - 1 AS gap_len
      FROM lagged WHERE prev_k IS NOT NULL AND k - prev_k > 1
    )
    SELECT gap_start, gap_end, CAST(gap_len AS BIGINT) AS gap_len
    FROM gaps
    ORDER BY gap_len DESC, gap_start
    LIMIT 20
    """,
    tags=("validation", "gaps", "surrogate-keys", "W1"),
)
def validation_key_gap_islands(spark, sf_dir):
    """Surrogate-key gap detection (the keys-not-time twin of session
    islands): contiguous RANGES of missing order keys, largest first —
    the audit that distinguishes \"sequence generator skips\" (many
    small gaps, normal) from \"lost ingestion batch\" (one huge gap,
    an incident).  The lag over the sorted distinct keys is the
    two-pass distributed form (operators/prefix.py): key range-bucket
    → within-bucket lag; a bucket's FIRST key takes the max key of
    all strictly-lower buckets as its predecessor (broadcast carry) —
    no SinglePartition window over the |keys|-sized table.  Emitting
    RANGES instead of per-key rows is what keeps the output readable
    when a million keys are missing.  Exact integer ranges, total
    order on (len desc, start)."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    ks = with_range_bucket(
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .distinct(),
        "k",
        64,
    )
    carry = lower_bucket_agg(
        ks.groupBy("__bkt").agg(F.max("k").alias("__bmax")),
        "__bkt",
        "__bmax",
        "__carry",
        combine="max",
        default=None,
    )
    lagged = ks.join(F.broadcast(carry), "__bkt", "left").withColumn(
        "prev_k",
        F.coalesce(
            F.lag("k").over(Window.partitionBy("__bkt").orderBy("k")),
            F.col("__carry"),
        ),
    )
    return (
        lagged.filter(
            F.col("prev_k").isNotNull() & (F.col("k") - F.col("prev_k") > 1)
        )
        .select(
            (F.col("prev_k") + 1).alias("gap_start"),
            (F.col("k") - 1).alias("gap_end"),
            (F.col("k") - F.col("prev_k") - 1).cast("bigint").alias("gap_len"),
        )
        .orderBy(F.desc("gap_len"), F.asc("gap_start"))
        .limit(20)
    )


@register(
    "validation_error_rate_pchart",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS x
      FROM events GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(x) AS BIGINT) AS xt
      FROM daily
    )
    SELECT d.d AS day_index, d.n, d.x,
           round(CAST(d.x AS DOUBLE) / d.n, 6) AS error_rate,
           -- all products in HUGEINT: x·N alone passes int64 at
           -- ~1e10 rows, the square at far smaller tables
           CAST(CASE WHEN (CAST(d.x AS HUGEINT) * p.nt
                           - CAST(d.n AS HUGEINT) * p.xt)
                          * (CAST(d.x AS HUGEINT) * p.nt
                           - CAST(d.n AS HUGEINT) * p.xt)
                          > 9 * CAST(d.n AS HUGEINT) * p.xt * (p.nt - p.xt)
                     THEN 1 ELSE 0 END AS INT) AS out_of_control,
           CAST(CASE WHEN CAST(d.x AS HUGEINT) * p.nt
                          > CAST(d.n AS HUGEINT) * p.xt THEN 1
                     WHEN CAST(d.x AS HUGEINT) * p.nt
                          < CAST(d.n AS HUGEINT) * p.xt THEN -1
                     ELSE 0 END AS INT) AS direction
    FROM daily d, pooled p
    ORDER BY d.d
    """,
    tags=("validation", "spc", "p-chart", "anomaly", "A4"),
)
def validation_error_rate_pchart(spark, sf_dir):
    """Statistical-process-control p-chart over the daily error rate,
    with the 3-sigma binomial limits cleared to EXACT integers: under
    the pooled rate p = X/N, a day is out of control when
    (x*N - n*X)^2 > 9 * n * X * (N - X) — the squared deviation vs
    nine binomial variances with every denominator multiplied out and
    every product run in DECIMAL(38,0)/HUGEINT (x·N alone passes int64
    near 1e10 rows), so the control flags carry no float boundary AND
    no overflow cliff (the displayed rate is cosmetic).  This is the release-health gate an ingest pipeline
    alarms on; per-day state is two integers, the pooled row is one
    broadcast, flags are map-side."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "datediff(to_date(date_trunc('day', ts)), DATE '2024-01-01')"
            ).alias("day_index")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("x"),
        )
    )
    pooled = daily.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("x").cast("bigint").alias("xt"),
    )
    # decimal(38,0) throughout: x·N alone passes int64 at ~1e10 rows
    xw = F.col("x").cast("decimal(38,0)")
    nw = F.col("n").cast("decimal(38,0)")
    dev = xw * F.col("nt") - nw * F.col("xt")
    return (
        daily.crossJoin(F.broadcast(pooled))
        .select(
            "day_index",
            "n",
            "x",
            F.round(F.col("x").cast("double") / F.col("n"), 6).alias(
                "error_rate"
            ),
            F.when(
                dev * dev
                > F.lit(9).cast("decimal(38,0)")
                * nw
                * F.col("xt")
                * (F.col("nt") - F.col("xt")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("out_of_control"),
            F.when(dev > 0, 1)
            .when(dev < 0, -1)
            .otherwise(0)
            .cast("int")
            .alias("direction"),
        )
        .orderBy("day_index")
    )


@register(
    "validation_linenumber_contiguity",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
             CAST(MIN(l_linenumber) AS BIGINT) AS min_ln,
             CAST(MAX(l_linenumber) AS BIGINT) AS max_ln
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (
             WHERE min_ln = 1 AND max_ln = n_lines AND n_distinct = n_lines)
             AS BIGINT) AS n_contiguous,
           CAST(COUNT(*) FILTER (WHERE n_distinct < n_lines) AS BIGINT)
             AS n_duplicated_lines,
           CAST(COUNT(*) FILTER (
             WHERE n_distinct = n_lines
               AND (min_ln <> 1 OR max_ln <> n_lines)) AS BIGINT)
             AS n_gapped,
           CAST(MAX(n_lines) AS BIGINT) AS max_lines_per_order
    FROM per_order
    """,
    tags=("validation", "contiguity", "integrity", "A4"),
)
def validation_linenumber_contiguity(spark, sf_dir):
    """Child-sequence integrity contract: every order's line numbers
    must be exactly 1..n (no duplicates, no gaps, starts at 1) — the
    shape a correct CDC replication of a parent-child pair preserves
    and a lost or doubled child row breaks.  Classified per failure
    mode (duplicated vs gapped) because they implicate different bugs:
    duplicates point at at-least-once apply without keys, gaps at
    partial-batch loss.  One group-by pass; the invariant check is
    three integer comparisons per order."""
    per_order = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("l_linenumber").alias("n_distinct"),
            F.min("l_linenumber").cast("bigint").alias("min_ln"),
            F.max("l_linenumber").cast("bigint").alias("max_ln"),
        )
    )
    contiguous = (
        (F.col("min_ln") == 1)
        & (F.col("max_ln") == F.col("n_lines"))
        & (F.col("n_distinct") == F.col("n_lines"))
    )
    return per_order.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(contiguous, 1)).alias("n_contiguous"),
        F.count(F.when(F.col("n_distinct") < F.col("n_lines"), 1)).alias(
            "n_duplicated_lines"
        ),
        F.count(
            F.when(
                (F.col("n_distinct") == F.col("n_lines"))
                & ((F.col("min_ln") != 1) | (F.col("max_ln") != F.col("n_lines"))),
                1,
            )
        ).alias("n_gapped"),
        F.max("n_lines").cast("bigint").alias("max_lines_per_order"),
    )


@register(
    "validation_referential_integrity",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS child_rows,
           CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
             AS orphan_rows
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'nation.n_regionkey->region',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE r.r_regionkey IS NULL) AS BIGINT)
    FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("validation", "referential-integrity", "J3", "A2"),
)
def validation_referential_integrity(spark, sf_dir):
    """Referential-integrity sweep: every FK edge of the schema
    checked in one report (child rows + orphans per edge) — the
    replication-health companion to row counts and checksums: a CDC
    pipeline that applies child inserts before parents (or loses
    parent batches) shows up here first, per edge, with exact counts.

    Plan: each edge is a left join counting null parents — parent
    sides are dimension-sized (broadcast) except lineitem→orders,
    which AQE plans as a shuffle join on the key; counts are map-side
    partial everywhere.  At 100 TB you run the edges you suspect;
    the report shape (edge, child_rows, orphan_rows) is the contract."""
    def edge(name, child, ckey, parent, pkey):
        c = table(spark, sf_dir, child).select(F.col(ckey))
        p = table(spark, sf_dir, parent).select(F.col(pkey))
        j = c.join(p, c[ckey] == p[pkey], "left")
        return j.agg(
            F.lit(name).alias("fk_edge"),
            F.count(F.lit(1)).alias("child_rows"),
            F.count(F.when(F.col(pkey).isNull(), 1))
            .cast("bigint")
            .alias("orphan_rows"),
        ).select("fk_edge", "child_rows", "orphan_rows")

    edges = [
        edge("orders.o_custkey->customer", "orders", "o_custkey",
             "customer", "c_custkey"),
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey"),
        edge("lineitem.l_partkey->part", "lineitem", "l_partkey",
             "part", "p_partkey"),
        edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
             "supplier", "s_suppkey"),
        edge("customer.c_nationkey->nation", "customer", "c_nationkey",
             "nation", "n_nationkey"),
        edge("nation.n_regionkey->region", "nation", "n_regionkey",
             "region", "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


@register(
    "validation_rate_shift_ztest",
    oracle="""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ),
    halves AS (
      SELECT e.event_type,
             CASE WHEN epoch_us(e.ts) * 2 < b.lo + b.hi THEN 0 ELSE 1 END
               AS half,
             CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events e, bounds b
    ),
    tot AS (
      SELECT half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(is_err) AS BIGINT) AS k
      FROM halves GROUP BY half
    ),
    wide AS (
      SELECT MAX(CASE WHEN half = 0 THEN n END) AS n1,
             MAX(CASE WHEN half = 0 THEN k END) AS k1,
             MAX(CASE WHEN half = 1 THEN n END) AS n2,
             MAX(CASE WHEN half = 1 THEN k END) AS k2
      FROM tot
    )
    SELECT n1, k1, n2, k2,
           CAST(k1 * 1000000 // n1 AS BIGINT) AS rate1_ppm,
           CAST(k2 * 1000000 // n2 AS BIGINT) AS rate2_ppm,
           round(
             (CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)
              - CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             / sqrt(
                 (CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 - CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))),
             6) AS z_score,
           CAST(CASE WHEN abs(
             (CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)
              - CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             / sqrt(
                 (CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 - CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))))
             > 1.96 THEN 1 ELSE 0 END AS INT) AS significant_95
    FROM wide
    """,
    tags=("validation", "monitoring", "ztest", "rate-shift"),
)
def validation_rate_shift_ztest(spark, sf_dir):
    """ERROR-RATE SHIFT detection between the first and second half of
    the stream's time range — the two-proportion pooled z-test a
    monitoring stack runs across a deploy boundary (the per-day
    p-chart flags outlier DAYS; this answers "did the rate LEVEL
    move?").  The half split uses exact integer µs arithmetic
    (ts·2 < lo+hi — no midpoint rounding), counts are exact, and the
    z statistic uses only correctly-rounded IEEE ops (+,−,×,÷,sqrt)
    in the identical tree on both engines, so even the significance
    flag is bit-deterministic.

    Scale shape: one min/max scan (a two-scalar broadcast), one
    map-side classified count — two passes over events, no shuffle
    wider than 2 rows."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    halves = e.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.unix_micros("ts") * 2 < F.col("lo") + F.col("hi"), 0
        ).otherwise(1).alias("half"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    tot = halves.groupBy("half").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_err").cast("bigint").alias("k"),
    )
    wide = tot.agg(
        F.max(F.when(F.col("half") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("half") == 0, F.col("k"))).alias("k1"),
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("half") == 1, F.col("k"))).alias("k2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    p1 = F.col("k1").cast("double") / n1d
    p2 = F.col("k2").cast("double") / n2d
    pp = (F.col("k1") + F.col("k2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    z = (p2 - p1) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1d + F.lit(1.0) / n2d)
    )
    return wide.select(
        "n1",
        "k1",
        "n2",
        "k2",
        F.expr("CAST(k1 * 1000000 div n1 AS BIGINT)").alias("rate1_ppm"),
        F.expr("CAST(k2 * 1000000 div n2 AS BIGINT)").alias("rate2_ppm"),
        F.round(z, 6).alias("z_score"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("int").alias(
            "significant_95"
        ),
    )


@register(
    "validation_uniqueness_contract",
    oracle="""
    WITH probes AS (
      SELECT 'customer.c_custkey' AS pk,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct
      FROM customer
      UNION ALL
      SELECT 'orders.o_orderkey', COUNT(*), COUNT(DISTINCT o_orderkey)
      FROM orders
      UNION ALL
      SELECT 'part.p_partkey', COUNT(*), COUNT(DISTINCT p_partkey)
      FROM part
      UNION ALL
      SELECT 'supplier.s_suppkey', COUNT(*), COUNT(DISTINCT s_suppkey)
      FROM supplier
      UNION ALL
      SELECT 'events.event_id', COUNT(*), COUNT(DISTINCT event_id)
      FROM events
      UNION ALL
      SELECT 'documents.doc_id', COUNT(*), COUNT(DISTINCT doc_id)
      FROM documents
      UNION ALL
      SELECT 'lineitem.(l_orderkey,l_linenumber)', COUNT(*),
             COUNT(DISTINCT l_orderkey * 1000 + l_linenumber)
      FROM lineitem
    )
    SELECT pk, n_rows, n_distinct,
           CAST(n_rows - n_distinct AS BIGINT) AS duplicate_rows,
           CAST(CASE WHEN n_rows = n_distinct THEN 1 ELSE 0 END AS BIGINT)
             AS is_unique
    FROM probes ORDER BY pk
    """,
    tags=("validation", "uniqueness", "quality", "A-family"),
)
def validation_uniqueness_contract(spark, sf_dir):
    """PRIMARY-KEY UNIQUENESS across every keyed table in ONE report —
    the constraint check lakehouse tables can't enforce at write time
    (no unique indexes at 100 TB), so it runs as a scheduled probe:
    per declared key, row count vs distinct count, the duplicate
    excess, and a pass flag.  The composite lineitem key folds into
    one integer (linenumber < 1000 by TPC-H contract) so the distinct
    is one column on both engines.  This is the uniqueness sibling of
    validation_referential_integrity: an upsert pipeline that double-
    applied a batch shows up HERE first (duplicate keys), before any
    FK edge breaks.  Scale: each probe is one map-side-combined
    count(distinct) — Spark plans the 7 probes as independent
    aggregates unioned at the end, nothing joins."""
    probes = []
    for label, tbl, key in [
        ("customer.c_custkey", "customer", F.col("c_custkey")),
        ("orders.o_orderkey", "orders", F.col("o_orderkey")),
        ("part.p_partkey", "part", F.col("p_partkey")),
        ("supplier.s_suppkey", "supplier", F.col("s_suppkey")),
        ("events.event_id", "events", F.col("event_id")),
        ("documents.doc_id", "documents", F.col("doc_id")),
        (
            "lineitem.(l_orderkey,l_linenumber)",
            "lineitem",
            F.col("l_orderkey") * 1000 + F.col("l_linenumber"),
        ),
    ]:
        t = table(spark, sf_dir, tbl)
        probes.append(
            t.agg(
                F.lit(label).alias("pk"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct(key).cast("bigint").alias("n_distinct"),
            )
        )
    rep = probes[0]
    for p in probes[1:]:
        rep = rep.unionByName(p)
    return rep.select(
        "pk",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct"))
        .cast("bigint")
        .alias("duplicate_rows"),
        F.when(F.col("n_rows") == F.col("n_distinct"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_unique"),
    ).orderBy("pk")


#: declared per-column null budgets in ppm (the data contract)
_NULL_BUDGETS = [
    ("orders.o_custkey", "orders", "o_custkey", 0),
    ("orders.o_totalprice", "orders", "o_totalprice", 0),
    ("events.user_id", "events", "user_id", 0),
    ("events.props", "events", "props", 10_000),
    ("documents.text", "documents", "text", 5_000),
    ("documents.lang", "documents", "lang", 50_000),
]


@register(
    "validation_null_rate_budget",
    oracle="""
    WITH probes AS (
      SELECT 'orders.o_custkey' AS col, CAST(0 AS BIGINT) AS budget_ppm,
             COUNT(*) AS n, COUNT(*) - COUNT(o_custkey) AS nulls
      FROM orders
      UNION ALL
      SELECT 'orders.o_totalprice', 0, COUNT(*),
             COUNT(*) - COUNT(o_totalprice) FROM orders
      UNION ALL
      SELECT 'events.user_id', 0, COUNT(*),
             COUNT(*) - COUNT(user_id) FROM events
      UNION ALL
      SELECT 'events.props', 10000, COUNT(*),
             COUNT(*) - COUNT(props) FROM events
      UNION ALL
      SELECT 'documents.text', 5000, COUNT(*),
             COUNT(*) - COUNT(text) FROM documents
      UNION ALL
      SELECT 'documents.lang', 50000, COUNT(*),
             COUNT(*) - COUNT(lang) FROM documents
    )
    SELECT col, budget_ppm,
           CAST(n AS BIGINT) AS n_rows,
           CAST(nulls AS BIGINT) AS n_nulls,
           CAST(nulls * 1000000 // n AS BIGINT) AS null_ppm,
           CAST(CASE WHEN nulls * 1000000 // n <= budget_ppm
                     THEN 1 ELSE 0 END AS BIGINT) AS within_budget
    FROM probes ORDER BY col
    """,
    tags=("validation", "quality", "contract", "A-family"),
)
def validation_null_rate_budget(spark, sf_dir):
    """NULL-RATE BUDGETS — the data contract as an executable probe:
    each column carries a declared maximum null rate (0 for keys and
    measures, small allowances for optional payloads) and the report
    grades actual null ppm against it.  The difference from a bare
    null-count profile is the BUDGET column: the check encodes what
    the downstream consumers tolerate, so a within_budget=0 row is an
    actionable contract breach, not a statistic (the reference's
    validation suite grades success rates the same way —
    src/validation/validation.py's Good/Warning/Poor bands).  Six
    single-pass COUNT aggregates unioned; exact integer ppm."""
    parts = []
    for label, tbl, col, budget in _NULL_BUDGETS:
        t = table(spark, sf_dir, tbl)
        parts.append(
            t.agg(
                F.lit(label).alias("col"),
                F.lit(budget).cast("bigint").alias("budget_ppm"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col))
                .cast("bigint")
                .alias("n_nulls"),
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    return rep.select(
        "col",
        "budget_ppm",
        "n_rows",
        "n_nulls",
        F.expr("n_nulls * 1000000 div n_rows").cast("bigint").alias("null_ppm"),
        F.when(
            F.expr("n_nulls * 1000000 div n_rows") <= F.col("budget_ppm"), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("within_budget"),
    ).orderBy("col")


@register(
    "validation_order_lineitem_reconcile",
    oracle="""
    WITH l AS (
      SELECT l_orderkey AS k,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS line_sum_c
      FROM lineitem GROUP BY l_orderkey
    ),
    o AS (
      SELECT o_orderkey AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
      FROM orders
    ),
    joined AS (
      SELECT COALESCE(o.k, l.k) AS k, o.total_c, l.line_sum_c,
             CASE
               WHEN o.k IS NULL THEN 'orphan_lineitems'
               WHEN l.k IS NULL THEN 'childless_order'
               ELSE CASE
                 WHEN ABS(l.line_sum_c - o.total_c) * 1000000
                      // o.total_c < 10000 THEN 'delta_lt_1pct'
                 WHEN ABS(l.line_sum_c - o.total_c) * 1000000
                      // o.total_c < 100000 THEN 'delta_lt_10pct'
                 WHEN ABS(l.line_sum_c - o.total_c) * 1000000
                      // o.total_c < 1000000 THEN 'delta_lt_100pct'
                 ELSE 'delta_ge_100pct'
               END
             END AS lane,
             CASE WHEN o.k IS NOT NULL AND l.k IS NOT NULL
                  THEN ABS(l.line_sum_c - o.total_c) ELSE 0 END AS abs_delta
      FROM o FULL OUTER JOIN l ON o.k = l.k
    )
    SELECT lane,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(abs_delta) AS BIGINT) AS sum_abs_delta_cents,
           CAST(bit_xor(k) AS BIGINT) AS keys_xor
    FROM joined GROUP BY lane ORDER BY lane
    """,
    tags=("validation", "reconciliation", "cross-table", "A-family"),
)
def validation_order_lineitem_reconcile(spark, sf_dir):
    """CROSS-TABLE RECONCILIATION REPORT — the accounting-style
    source-vs-rollup audit (does the order header total match the sum
    of its lines?) the reference's validation layer approximates with
    row counts (src/validation/validation.py:221-227) generalized to
    VALUE balance: per order, the exact cents delta between the header
    total and the lineitem sum, bucketed by exact integer relative-
    drift thresholds (1% / 10% / 100%), plus the two referential lanes (childless orders,
    orphan lineitems) from one FULL OUTER JOIN.  Every lane carries an
    exact sum and a key-XOR membership digest, so a downstream repair
    job can verify it fixed EXACTLY the reported set.

    Scale shape: one |orders|-keyed rollup of lineitem, one full outer
    join on the order key (both sides hash-partitioned on it — at
    scale a bucketed layout makes this co-located), a |lanes|-row
    census."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    l_sum = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("line_sum_c")
    )
    o_tot = o.select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("total_c"),
    )
    joined = o_tot.join(l_sum, "k", "full_outer").select(
        "k",
        "total_c",
        "line_sum_c",
        F.when(F.col("total_c").isNull(), "orphan_lineitems")
        .when(F.col("line_sum_c").isNull(), "childless_order")
        .otherwise(
            # exact integer thresholds, no log10: CEIL(LOG10(x)) at an
            # exact power of 10 is a cross-engine float boundary
            F.expr(
                """
                CASE
                  WHEN ABS(line_sum_c - total_c) * 1000000 div total_c
                       < 10000 THEN 'delta_lt_1pct'
                  WHEN ABS(line_sum_c - total_c) * 1000000 div total_c
                       < 100000 THEN 'delta_lt_10pct'
                  WHEN ABS(line_sum_c - total_c) * 1000000 div total_c
                       < 1000000 THEN 'delta_lt_100pct'
                  ELSE 'delta_ge_100pct'
                END
                """
            )
        )
        .alias("lane"),
        F.when(
            F.col("total_c").isNotNull() & F.col("line_sum_c").isNotNull(),
            F.abs(F.col("line_sum_c") - F.col("total_c")),
        )
        .otherwise(0)
        .alias("abs_delta"),
    )
    return (
        joined.groupBy("lane")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("abs_delta").cast("bigint").alias("sum_abs_delta_cents"),
            F.expr("bit_xor(k)").cast("bigint").alias("keys_xor"),
        )
        .orderBy("lane")
    )

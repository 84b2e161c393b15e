"""A/B experimentation declared queries (round 8).

The analytics layer every product org runs on top of the event
stream: deterministic hash assignment, sample-ratio-mismatch guards,
and CUPED variance reduction — all from ONE pass of exact-integer
sufficient statistics, the same mergeable-sums discipline as
``stats_ols_by_brand`` / ``stats_correlation_matrix``.

Reference grounding: the reference's validation layer stops at
row-count/freshness probes (src/validation/validation.py); an
experimentation readout is the natural next consumer of the same
per-table aggregates, and at 100 TB it must be suffstats-shaped (one
groupBy; adding a metric adds columns, never shuffles).

Determinism contract: every sum is an exact integer (cents), both
engines then apply IDENTICAL IEEE expression trees, and ratios that
gate decisions (SRM χ², conversion shares) are exact integer ppm.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table

#: pre/post boundary for the CUPED covariate window
_CUPED_CUTOFF = "2024-01-16 00:00:00"

#: deterministic 50/50 assignment: first hex digit of md5(user_id)
_ARM_SQL = (
    "CASE WHEN CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 1),"
    " 16, 10) AS INTEGER) % 2 = 0 THEN 'A' ELSE 'B' END"
)
_ARM_DUCK = (
    "CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)"
    " IN ('0', '2', '4', '6', '8', 'a', 'c', 'e')"
    " THEN 'A' ELSE 'B' END"
)


@register(
    "experiment_cuped_adjusted",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             {_ARM_DUCK} AS arm,
             SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}'
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS x,
             SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOFF}'
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM per_user
    ),
    theta AS (
      SELECT n, sx, sy,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS th,
             ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
      FROM pooled
    ),
    arms AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sx_arm,
             CAST(SUM(y) AS BIGINT) AS sy_arm
      FROM per_user GROUP BY arm
    )
    SELECT a.arm, a.n_users, a.sy_arm AS sum_y_cents,
           round(CAST(a.sy_arm AS DOUBLE) / CAST(a.n_users AS DOUBLE), 6)
             AS mean_y,
           round(CAST(a.sy_arm AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                 - t.th * (CAST(a.sx_arm AS DOUBLE)
                           / CAST(a.n_users AS DOUBLE)
                           - CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)),
                 6) AS mean_y_adj,
           round(t.th, 6) AS theta,
           round(t.r2, 6) AS var_reduction
    FROM arms a, theta t
    ORDER BY a.arm
    """,
    tags=("experiment", "cuped", "stats", "A-family"),
)
def experiment_cuped_adjusted(spark, sf_dir):
    """CUPED variance reduction (Deng et al., WSDM'13 — public) for a
    deterministic 50/50 hash split: the pre-period spend X of each
    user is the control covariate for their post-period spend Y,
    θ = cov(X,Y)/var(X) pooled across arms, and each arm reports its
    raw and CUPED-adjusted mean (Y − θ·(X − X̄)).  The achieved
    variance reduction IS the pooled r² — both θ and r² come off the
    SAME six exact-integer sufficient sums as stats_ols_by_brand, so
    the whole readout is one user-keyed aggregate + one 1-row pooled
    aggregate; adding metrics adds columns, never shuffles.  Arms are
    md5-parity (first hex digit), reproducible across engines and
    reruns — the A/B bucketing a real platform derives from a stable
    user hash.  Determinism: exact BIGINT cents sums (< 2^53 at every
    tested sf), identical IEEE trees both sides, round(·, 6)."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("ts") < F.lit(_CUPED_CUTOFF).cast("timestamp"),
                F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0))
        ).alias("x"),
        F.sum(
            F.when(
                F.col("ts") >= F.lit(_CUPED_CUTOFF).cast("timestamp"),
                F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0))
        ).alias("y"),
    ).withColumn("arm", F.expr(_ARM_SQL))
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    dxy = nd * F.col("sxy").cast("double") - sxd * syd
    dxx = nd * F.col("sxx").cast("double") - sxd * sxd
    dyy = nd * F.col("syy").cast("double") - syd * syd
    theta = pooled.select(
        "n", "sx", (dxy / dxx).alias("th"), ((dxy * dxy) / (dxx * dyy)).alias("r2")
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sx_arm"),
        F.sum("y").cast("bigint").alias("sy_arm"),
    )
    j = arms.crossJoin(F.broadcast(theta))
    mean_y = F.col("sy_arm").cast("double") / F.col("n_users").cast("double")
    mean_x = F.col("sx_arm").cast("double") / F.col("n_users").cast("double")
    mean_x_pool = F.col("sx").cast("double") / F.col("n").cast("double")
    return j.select(
        "arm",
        "n_users",
        F.col("sy_arm").alias("sum_y_cents"),
        F.round(mean_y, 6).alias("mean_y"),
        F.round(mean_y - F.col("th") * (mean_x - mean_x_pool), 6).alias(
            "mean_y_adj"
        ),
        F.round(F.col("th"), 6).alias("theta"),
        F.round(F.col("r2"), 6).alias("var_reduction"),
    ).orderBy("arm")


#: χ²(1) critical value at α=0.05, in ppm (3.841459)
_SRM_CRIT_PPM = 3_841_459


@register(
    "experiment_srm_check",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, {_ARM_DUCK} AS arm
      FROM events GROUP BY user_id
    ),
    counts AS (
      SELECT
        COUNT(*) FILTER (arm = 'A') AS n_a,
        COUNT(*) FILTER (arm = 'B') AS n_b
      FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
                AS BIGINT) AS chi2_ppm,
           CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000000
                          // (n_a + n_b) > {_SRM_CRIT_PPM}
                     THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM counts
    """,
    tags=("experiment", "srm", "validation", "A-family"),
)
def experiment_srm_check(spark, sf_dir):
    """SAMPLE-RATIO-MISMATCH guard — the first thing any experiment
    readout must check: under a 50/50 split the χ²(1) statistic
    reduces to (n_a − n_b)²/n, computed here as an EXACT integer in
    ppm and compared against the 3.841459 critical value (α=0.05), so
    the gate itself is integer arithmetic — no float χ² CDF in either
    engine.  A tripped flag means the assignment or logging pipeline
    is dropping one arm's users and every downstream metric is
    untrustworthy (the experimentation twin of the reference's
    row-count validation probe).  One user-keyed distinct + a 1-row
    count — nothing data-sized moves."""
    e = table(spark, sf_dir, "events")
    per_user = (
        e.select("user_id").distinct().withColumn("arm", F.expr(_ARM_SQL))
    )
    counts = per_user.agg(
        F.count(F.when(F.col("arm") == "A", 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("arm") == "B", 1)).cast("bigint").alias("n_b"),
    )
    chi2 = F.expr("(n_a - n_b) * (n_a - n_b) * 1000000 div (n_a + n_b)")
    return counts.select(
        "n_a",
        "n_b",
        chi2.cast("bigint").alias("chi2_ppm"),
        F.when(chi2 > _SRM_CRIT_PPM, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("srm_flag"),
    )

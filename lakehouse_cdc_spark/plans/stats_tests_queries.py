"""Nonparametric / categorical statistical tests (round 9).

The data-QA battery a training-data pipeline and an experimentation
platform both run on top of the event stream and the document corpus:
distribution-shift tests (Kolmogorov–Smirnov, Mann–Whitney U with tie
correction, one-way ANOVA), label-quality diagnostics (Cohen's kappa
inter-annotator agreement, calibration reliability / ECE), and a
segmented uplift readout.  All are textbook-public statistics.

Reference grounding: the reference's validation layer compares row
counts and checksums between source and sink
(src/validation/validation.py); these queries are the statistical
generalization of the same idea — "did the distribution move?" rather
than "did a row go missing?" — and at 100 TB they must be
sufficient-statistics-shaped: one value-keyed aggregate, a two-pass
prefix scan where a CDF is needed (never an unpartitioned global
window), and one scalar combine.

Determinism contract (the house rules): every accumulated quantity is
an exact integer (cents, counts, rank-doubles) in BIGINT/DECIMAL(38,0),
ratios that gate decisions are exact integer ppm via the proven
``x * 1000000 / total`` decimal idiom (``profile_gini_impurity``), and
the few genuinely real-valued statistics (z, F) apply IDENTICAL IEEE
expression trees to identical exact integers on both engines, then
``round(·, 6)``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.prefix import (
    lower_bucket_agg,
    with_range_bucket,
)
from lakehouse_cdc_spark.plans.experiment_queries import _ARM_DUCK, _ARM_SQL
from lakehouse_cdc_spark.plans.registry import register, table

_PM = "CAST(1000000 AS DECIMAL(38,0))"


def _arm_value_counts(spark, sf_dir):
    """Per-distinct-purchase-value (cents) counts by md5 arm — the
    shared sufficient statistic of the KS and Mann–Whitney tests:
    |distinct values| rows, one map-side-combined aggregate of the
    event scan.  Ranks and CDFs then derive from prefix sums over
    THIS table, so the tests cost O(|distinct|) post-shuffle work no
    matter how many raw rows back it."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.expr(_ARM_SQL).alias("arm"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
            .cast("bigint")
            .alias("c1"),
            F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
            .cast("bigint")
            .alias("c2"),
        )
    )


def _with_cumulative(counts, cols):
    """Exact prefix sums of ``cols`` over the value order WITHOUT an
    unpartitioned window: quantile range-bucket (32) → within-bucket
    cumulative window → broadcast carry of strictly-lower bucket
    totals (operators/prefix.py discipline).

    ``counts`` is eagerly localCheckpoint-ed: it is
    |distinct value|-sized by construction, but this helper (bounds +
    rows + per-bucket totals + two carry self-joins) and its callers
    reference it up to ten times — with full lineage, EVERY reference
    re-ran the corpus-sized aggregation that produced it (the KS
    physical plan carried 66 parquet scans of events, r12
    measurement; 2 after this cut).  ``.persist()`` was measured
    first and REJECTED: the InMemoryRelation blocked AQE partition
    coalescing, so the many tiny downstream stages ran at full
    shuffle-partition width — 4–6× SLOWER than no cache at all
    (guide §5: cache only when recompute beats the pressure it
    creates).  The eager checkpoint of the tiny sufficient statistic
    truncates lineage at wall-clock parity locally and drops the
    corpus re-scans that dominate at scale."""
    counts = counts.coalesce(8).localCheckpoint()
    b = with_range_bucket(counts, "v", 32, "__bkt")
    w = (
        Window.partitionBy("__bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        b = b.withColumn(f"__in_{c}", F.sum(c).over(w))
    per_bucket = b.groupBy("__bkt").agg(
        *[F.sum(c).cast("bigint").alias(f"__tot_{c}") for c in cols]
    )
    out = b
    for c in cols:
        carry = lower_bucket_agg(per_bucket, "__bkt", f"__tot_{c}", f"__lo_{c}")
        out = out.join(carry, "__bkt")
        out = out.withColumn(
            f"cum_{c}", (F.col(f"__in_{c}") + F.col(f"__lo_{c}")).cast("bigint")
        ).drop(f"__in_{c}", f"__lo_{c}")
    return out.drop("__bkt")


@register(
    "stats_ks_two_sample",
    bench=True,
    oracle=f"""
    WITH vals AS (
      SELECT {_ARM_DUCK} AS arm,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    counts AS (
      SELECT v,
             CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
      FROM vals GROUP BY v
    ),
    cum AS (
      SELECT v,
             CAST(SUM(c1) OVER (ORDER BY v) AS HUGEINT) AS f1,
             CAST(SUM(c2) OVER (ORDER BY v) AS HUGEINT) AS f2
      FROM counts
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS HUGEINT) AS n1, CAST(SUM(c2) AS HUGEINT) AS n2
      FROM counts
    ),
    gaps AS (
      SELECT v, ABS(f1 * t.n2 - f2 * t.n1) AS gap
      FROM cum, tot t
    ),
    d AS (SELECT MAX(gap) AS d_num FROM gaps)
    SELECT CAST(t.n1 AS BIGINT) AS n1,
           CAST(t.n2 AS BIGINT) AS n2,
           CAST(d.d_num * 1000000 // (t.n1 * t.n2) AS BIGINT) AS d_ppm,
           CAST((SELECT MIN(v) FROM gaps WHERE gap = d.d_num) AS BIGINT)
             AS d_at_cents
    FROM tot t, d
    """,
    tags=("stats", "hypothesis-test", "drift", "A-family"),
)
def stats_ks_two_sample(spark, sf_dir):
    """TWO-SAMPLE KOLMOGOROV–SMIRNOV — the distribution-shift gate a
    data pipeline runs between cohorts (here: purchase values of the
    md5-parity A/B split): D = max_x |F̂₁(x) − F̂₂(x)|, reported as
    exact integer ppm by clearing denominators — the gap at each
    distinct value is |cumc₁·n₂ − cumc₂·n₁| over n₁·n₂, so the max and
    its location (first value attaining it) are INTEGER comparisons,
    immune to float CDF accumulation error.  Cross products ride
    DECIMAL(38,0): at 100 TB cum·n exceeds int64 (the round-3
    overflow-cliff lesson applied ahead of time).

    Scale shape: one map-side-combined value-count aggregate
    (|distinct cents| rows survive), the two-pass prefix scan for the
    CDFs (quantile range-buckets + broadcast carry — NO unpartitioned
    window), one scalar max.  Adding more cohorts adds count columns,
    never shuffles."""
    counts = _arm_value_counts(spark, sf_dir)
    cum = _with_cumulative(counts, ["c1", "c2"])
    tot = counts.agg(
        F.sum("c1").cast("decimal(38,0)").alias("n1"),
        F.sum("c2").cast("decimal(38,0)").alias("n2"),
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        F.abs(
            F.col("cum_c1").cast("decimal(38,0)") * F.col("n2")
            - F.col("cum_c2").cast("decimal(38,0)") * F.col("n1")
        ).alias("gap"),
    )
    # max gap AND its first location in ONE aggregation: structs
    # compare lexicographically, so max(struct(gap, -v)) picks the
    # maximal gap and, among ties, the maximal -v — i.e. the MIN v —
    # replacing the r11 three-pass form (max, then a self-join of the
    # gap table against its own max, then a combine) that re-derived
    # the whole upstream per pass (guide §2.4 remove shuffles; §1.2
    # fix the algorithm before the kernels).
    best = gaps.groupBy("n1", "n2").agg(
        F.max(F.struct(F.col("gap"), (-F.col("v")).alias("negv"))).alias("m")
    )
    return best.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        (F.col("m.gap") * F.expr(_PM) / (F.col("n1") * F.col("n2")))
        .cast("bigint")
        .alias("d_ppm"),
        (-F.col("m.negv")).cast("bigint").alias("d_at_cents"),
    )


@register(
    "stats_mannwhitney_u",
    oracle=f"""
    WITH vals AS (
      SELECT {_ARM_DUCK} AS arm,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    counts AS (
      SELECT v,
             CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
      FROM vals GROUP BY v
    ),
    ranked AS (
      SELECT v, c1, c2, c1 + c2 AS c,
             CAST(COALESCE(SUM(c1 + c2) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS HUGEINT) AS below
      FROM counts
    ),
    sums AS (
      SELECT CAST(SUM(c1) AS HUGEINT) AS n1,
             CAST(SUM(c2) AS HUGEINT) AS n2,
             CAST(SUM(CAST(c1 AS HUGEINT)
                      * (2 * below + c + 1)) AS HUGEINT) AS r1_x2,
             CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS tie_t
      FROM ranked
    ),
    u AS (
      SELECT n1, n2, r1_x2, tie_t,
             r1_x2 - n1 * (n1 + 1) AS u1_x2,
             2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u2_x2,
             n1 + n2 AS n
      FROM sums
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           CAST(r1_x2 AS BIGINT) AS r1_x2,
           CAST(u1_x2 AS BIGINT) AS u1_x2,
           CAST(u2_x2 AS BIGINT) AS u2_x2,
           CAST(tie_t AS BIGINT) AS tie_t,
           round((CAST(u1_x2 AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                        * ((CAST(n AS DOUBLE) + 1.0)
                           - CAST(tie_t AS DOUBLE)
                             / (CAST(n AS DOUBLE)
                                * (CAST(n AS DOUBLE) - 1.0)))),
                 6) AS z
    FROM u
    """,
    tags=("stats", "hypothesis-test", "rank", "A-family"),
)
def stats_mannwhitney_u(spark, sf_dir):
    """MANN–WHITNEY U (Wilcoxon rank-sum) with exact tie handling —
    the nonparametric location test for "did arm B's purchase values
    shift?": average ranks of tied groups are kept EXACT by working in
    doubled ranks (a tie group occupying ranks [s, s+c−1] has
    2·r̄ = 2·below + c + 1, an integer), so R₁, U₁, U₂ and the tie
    term T = Σ(c³−c) are all exact integers and U₁ + U₂ = n₁·n₂ is a
    structural identity the oracle re-derives.  The normal-approx z
    applies the identical IEEE tree to the same exact integers on both
    engines (round 6) — the only real-valued emission.

    Scale shape: identical to stats_ks_two_sample — one value-count
    aggregate, the two-pass prefix scan for the strictly-below counts
    (no unpartitioned window; the ORDER BY window in the ORACLE is
    DuckDB-side only), one scalar combine.  Doubled ranks accumulate
    in DECIMAL(38,0): c·(2N+1) products clear int64 at 100 TB."""
    counts = _arm_value_counts(spark, sf_dir)
    cum = _with_cumulative(counts, ["c1", "c2"])
    ranked = cum.select(
        "c1",
        (F.col("c1") + F.col("c2")).alias("c"),
        (
            F.col("cum_c1").cast("decimal(38,0)")
            + F.col("cum_c2").cast("decimal(38,0)")
            - (F.col("c1") + F.col("c2")).cast("decimal(38,0)")
        ).alias("below"),
    )
    sums = ranked.agg(
        F.sum(F.col("c1").cast("decimal(38,0)")).alias("n1"),
        (
            F.sum((F.col("c") - F.col("c1")).cast("decimal(38,0)"))
        ).alias("n2"),
        F.sum(
            F.col("c1").cast("decimal(38,0)")
            * (F.lit(2).cast("decimal(38,0)") * F.col("below")
               + F.col("c").cast("decimal(38,0)")
               + F.lit(1).cast("decimal(38,0)"))
        ).alias("r1_x2"),
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
            - F.col("c").cast("decimal(38,0)")
        ).alias("tie_t"),
    )
    return sums.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("r1_x2").cast("bigint").alias("r1_x2"),
        (F.col("r1_x2") - F.col("n1") * (F.col("n1") + F.lit(1)))
        .cast("bigint")
        .alias("u1_x2"),
        (
            F.lit(2).cast("decimal(38,0)") * F.col("n1") * F.col("n2")
            - (F.col("r1_x2") - F.col("n1") * (F.col("n1") + F.lit(1)))
        )
        .cast("bigint")
        .alias("u2_x2"),
        F.col("tie_t").cast("bigint").alias("tie_t"),
        F.round(
            F.expr(
                """
                (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                       * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                          - CAST(tie_t AS DOUBLE)
                            / (CAST(n1 + n2 AS DOUBLE)
                               * (CAST(n1 + n2 AS DOUBLE) - 1.0))))
                """
            ),
            6,
        ).alias("z"),
    )


@register(
    "stats_anova_oneway",
    oracle="""
    WITH x AS (
      SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g,
             CAST(SUM(v) AS HUGEINT) AS s_g,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS ss_g
      FROM x GROUP BY g
    ),
    terms AS (
      SELECT g, n_g, s_g, ss_g,
             (s_g * s_g * 1000000) // n_g AS term_scaled
      FROM per_g
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS HUGEINT) AS n,
             CAST(SUM(s_g) AS HUGEINT) AS s,
             CAST(SUM(ss_g) AS HUGEINT) AS ss,
             CAST(SUM(term_scaled) AS HUGEINT) AS sum_terms
      FROM terms
    ),
    parts AS (
      SELECT k, CAST(n AS BIGINT) AS n,
             sum_terms - (s * s * 1000000) // n AS ssb_scaled,
             ss * 1000000 - sum_terms AS ssw_scaled
      FROM tot
    )
    SELECT k, n,
           round((CAST(ssb_scaled AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
                 / (CAST(ssw_scaled AS DOUBLE)
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
                 6) AS f_stat,
           CAST(ssb_scaled * 1000000 // (ssb_scaled + ssw_scaled) AS BIGINT)
             AS eta_sq_ppm
    FROM parts
    """,
    tags=("stats", "hypothesis-test", "anova", "A-family"),
)
def stats_anova_oneway(spark, sf_dir):
    """ONE-WAY ANOVA across event types on purchase-cents values: the
    between/within sum-of-squares decomposition from per-group exact
    sufficient statistics (n_g, Σx, Σx²) — the same mergeable-sums
    discipline as stats_ols_by_brand, so adding groups or metrics
    never adds a shuffle.  The rational terms s_g²/n_g are cleared to
    exact integers by a fixed 10⁶ scaling with floor division (bias
    ≤ k·10⁻⁶ cents², identical on both engines); SSB, SSW and the
    η² effect size are then pure DECIMAL(38,0)/HUGEINT arithmetic —
    s² at 100 TB is ~10²⁶, far past int64 — and only the final F
    statistic touches doubles (identical IEEE tree both sides,
    round 6).

    Scale shape: ONE map-side-combined groupBy(event_type) over the
    scan, then a k-row scalar combine.  The 100 TB cost is the scan."""
    e = table(spark, sf_dir, "events")
    x = e.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
    )
    per_g = x.groupBy("g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_g"),
        F.sum("v").cast("decimal(38,0)").alias("s_g"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("ss_g"),
    )
    terms = per_g.withColumn(
        "term_scaled",
        F.floor(
            F.col("s_g") * F.col("s_g") * F.expr(_PM) / F.col("n_g")
        ).cast("decimal(38,0)"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum("term_scaled").alias("sum_terms"),
    )
    parts = tot.select(
        "k",
        F.col("n").cast("bigint").alias("n"),
        (
            F.col("sum_terms")
            - F.floor(F.col("s") * F.col("s") * F.expr(_PM) / F.col("n")).cast(
                "decimal(38,0)"
            )
        ).alias("ssb_scaled"),
        (F.col("ss") * F.expr(_PM) - F.col("sum_terms")).alias("ssw_scaled"),
    )
    return parts.select(
        "k",
        "n",
        F.round(
            F.expr(
                """
                (CAST(ssb_scaled AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
                / (CAST(ssw_scaled AS DOUBLE)
                   / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                """
            ),
            6,
        ).alias("f_stat"),
        (
            F.col("ssb_scaled")
            * F.expr(_PM)
            / (F.col("ssb_scaled") + F.col("ssw_scaled"))
        )
        .cast("bigint")
        .alias("eta_sq_ppm"),
    )


# rater thresholds: word count ≈ n_chars / 5.5 on the synthetic corpus,
# so the two heuristics agree often but not always — a realistic
# inter-annotator setting with deterministic, engine-neutral "raters"
_KAPPA_WC = (30, 60)  # rater A: short < 30 ≤ mid < 60 ≤ long (words)
_KAPPA_NC = (165, 330)  # rater B: same classes proxied by chars


@register(
    "stats_cohens_kappa",
    oracle=f"""
    WITH rated AS (
      SELECT CASE
               WHEN len(string_split(text, ' ')) >= {_KAPPA_WC[1]} THEN 2
               WHEN len(string_split(text, ' ')) >= {_KAPPA_WC[0]} THEN 1
               ELSE 0 END AS ra,
             CASE
               WHEN n_chars >= {_KAPPA_NC[1]} THEN 2
               WHEN n_chars >= {_KAPPA_NC[0]} THEN 1
               ELSE 0 END AS rb
      FROM documents
    ),
    cells AS (
      SELECT ra, rb, CAST(COUNT(*) AS HUGEINT) AS c
      FROM rated GROUP BY ra, rb
    ),
    tot AS (
      SELECT CAST(SUM(c) AS HUGEINT) AS n,
             CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END) AS HUGEINT)
               AS diag
      FROM cells
    ),
    mm AS (
      SELECT n, diag,
             (SELECT CAST(SUM(a.t * b.t) AS HUGEINT) FROM
               (SELECT ra AS k, SUM(c) AS t FROM cells GROUP BY ra) a
               JOIN
               (SELECT rb AS k, SUM(c) AS t FROM cells GROUP BY rb) b
               USING (k)) AS pe_prod
      FROM tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(diag AS BIGINT) AS n_agree,
           CAST(diag * 1000000 // n AS BIGINT) AS po_ppm,
           CAST(pe_prod * 1000000 // (n * n) AS BIGINT) AS pe_ppm,
           CAST((diag * n - pe_prod) * 1000000 // (n * n - pe_prod)
                AS BIGINT) AS kappa_ppm
    FROM mm
    """,
    tags=("stats", "labels", "agreement", "A-family"),
)
def stats_cohens_kappa(spark, sf_dir):
    """COHEN'S KAPPA inter-annotator agreement — the label-quality
    gate of every human/model annotation pipeline: two deterministic
    "raters" classify each document short/mid/long (rater A by word
    count, rater B by character count — correlated but not identical,
    like real annotators), and κ = (p₀ − pₑ)/(1 − pₑ) is computed
    ENTIRELY in integer arithmetic by clearing denominators:
    κ·(N² − Pₑ) = (diag·N − Pₑ) where Pₑ = Σᵢ rowᵢ·colᵢ — no float
    probabilities, exact ppm out, DECIMAL(38,0)/HUGEINT products (N²
    at 100 TB overflows int64).  Agreement here is positive by
    construction (both raters are monotone in document length), so
    floor division and truncation coincide on both engines.

    Scale shape: one map-side-combined 9-cell confusion aggregate over
    the document scan, then scalar arithmetic over ≤9 rows.  Adding
    raters or classes grows the tiny cell table, never the shuffle."""
    d = table(spark, sf_dir, "documents")
    wc = F.size(F.split(F.col("text"), " "))
    rated = d.select(
        F.when(wc >= _KAPPA_WC[1], 2)
        .when(wc >= _KAPPA_WC[0], 1)
        .otherwise(0)
        .alias("ra"),
        F.when(F.col("n_chars") >= _KAPPA_NC[1], 2)
        .when(F.col("n_chars") >= _KAPPA_NC[0], 1)
        .otherwise(0)
        .alias("rb"),
    )
    cells = rated.groupBy("ra", "rb").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    ra_tot = cells.groupBy("ra").agg(F.sum("c").alias("ta"))
    rb_tot = cells.groupBy("rb").agg(F.sum("c").alias("tb"))
    pe = (
        ra_tot.join(
            rb_tot, ra_tot["ra"].cast("int") == rb_tot["rb"].cast("int")
        )
        .agg(F.sum(F.col("ta") * F.col("tb")).alias("pe_prod"))
    )
    base = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("diag"),
    )
    return (
        base.crossJoin(F.broadcast(pe))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("diag").cast("bigint").alias("n_agree"),
            (F.col("diag") * F.expr(_PM) / F.col("n"))
            .cast("bigint")
            .alias("po_ppm"),
            (F.col("pe_prod") * F.expr(_PM) / (F.col("n") * F.col("n")))
            .cast("bigint")
            .alias("pe_ppm"),
            (
                (F.col("diag") * F.col("n") - F.col("pe_prod"))
                * F.expr(_PM)
                / (F.col("n") * F.col("n") - F.col("pe_prod"))
            )
            .cast("bigint")
            .alias("kappa_ppm"),
        )
    )


_ECE_CONF_PER_WORD = 12500  # conf_ppm = min(1e6, words · 12500): 80 words → 1.0
_ECE_LABEL_CHARS = 250  # ground truth: document is "long" at ≥ 250 chars


@register(
    "stats_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT LEAST(1000000,
                   len(string_split(text, ' ')) * {_ECE_CONF_PER_WORD})
               AS conf_ppm,
             CASE WHEN n_chars >= {_ECE_LABEL_CHARS} THEN 1 ELSE 0 END
               AS label
      FROM documents
    ),
    binned AS (
      SELECT LEAST(conf_ppm // 100000, 9) AS bin, conf_ppm, label
      FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(CAST(SUM(conf_ppm) AS HUGEINT) // COUNT(*) AS BIGINT)
             AS conf_ppm,
           CAST(CAST(SUM(label) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
             AS acc_ppm,
           CAST(ABS(CAST(SUM(label) AS HUGEINT) * 1000000
                    - CAST(SUM(conf_ppm) AS HUGEINT)) AS BIGINT)
             AS gap_weighted
    FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("stats", "labels", "calibration", "A-family"),
)
def stats_calibration_ece(spark, sf_dir):
    """CALIBRATION RELIABILITY DIAGRAM + ECE numerators — the
    quality-classifier diagnostic every model-scored corpus needs
    before its scores gate filtering: a deterministic length-based
    confidence (words·12500 ppm, capped at 1.0) against the ≥250-chars
    ground truth, cut into 10 confidence bins.  Each bin reports its
    exact mean confidence and accuracy in integer ppm plus the exact
    |accuracy − confidence| ECE numerator (gap_weighted = |n_pos·10⁶ −
    Σconf| — summing these over bins and dividing by N·10⁶ IS the
    expected calibration error, with zero float accumulation).
    HUGEINT/DECIMAL(38,0) sums: Σconf approaches N·10⁶ which clears
    int64 at 100 TB.

    Scale shape: one map-side-combined 10-bin aggregate over the
    document scan — the reliability diagram is a groupBy, not a join."""
    d = table(spark, sf_dir, "documents")
    wc = F.size(F.split(F.col("text"), " "))
    scored = d.select(
        F.least(
            F.lit(1000000), wc.cast("bigint") * F.lit(_ECE_CONF_PER_WORD)
        ).alias("conf_ppm"),
        F.when(F.col("n_chars") >= _ECE_LABEL_CHARS, 1)
        .otherwise(0)
        .alias("label"),
    )
    binned = scored.select(
        F.least(F.expr("conf_ppm div 100000"), F.lit(9))
        .cast("bigint")
        .alias("bin"),
        "conf_ppm",
        "label",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("n_pos"),
            (
                F.sum(F.col("conf_ppm").cast("decimal(38,0)"))
                / F.count(F.lit(1)).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("conf_ppm"),
            (
                F.sum(F.col("label").cast("decimal(38,0)")) * F.expr(_PM)
                / F.count(F.lit(1)).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("acc_ppm"),
            F.abs(
                F.sum(F.col("label").cast("decimal(38,0)")) * F.expr(_PM)
                - F.sum(F.col("conf_ppm").cast("decimal(38,0)"))
            )
            .cast("bigint")
            .alias("gap_weighted"),
        )
        .orderBy("bin")
    )


_UPLIFT_SPEND_CENTS = 150_000  # "high-value user" outcome threshold
_SEG_BOUNDS = (60, 70)  # activity segments: low < 60 ≤ mid < 70 ≤ high


@register(
    "experiment_uplift_by_segment",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, {_ARM_DUCK} AS arm,
             COUNT(*) AS n_events,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS spend_c
      FROM events GROUP BY user_id
    ),
    seg AS (
      SELECT CASE WHEN n_events >= {_SEG_BOUNDS[1]} THEN 'high'
                  WHEN n_events >= {_SEG_BOUNDS[0]} THEN 'mid'
                  ELSE 'low' END AS segment,
             arm,
             CASE WHEN spend_c >= {_UPLIFT_SPEND_CENTS} THEN 1 ELSE 0 END
               AS outcome
      FROM per_user
    ),
    arms AS (
      SELECT segment,
             CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(SUM(CASE WHEN arm = 'A' THEN outcome ELSE 0 END)
                  AS BIGINT) AS pos_a,
             CAST(SUM(CASE WHEN arm = 'B' THEN outcome ELSE 0 END)
                  AS BIGINT) AS pos_b
      FROM seg GROUP BY segment
    )
    SELECT segment, n_a, n_b, pos_a, pos_b,
           CASE WHEN n_a > 0
                THEN CAST(CAST(pos_a AS HUGEINT) * 1000000 // n_a AS BIGINT)
           END AS rate_a_ppm,
           CASE WHEN n_b > 0
                THEN CAST(CAST(pos_b AS HUGEINT) * 1000000 // n_b AS BIGINT)
           END AS rate_b_ppm,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN CAST(CAST(pos_b AS HUGEINT) * 1000000 // n_b
                          - CAST(pos_a AS HUGEINT) * 1000000 // n_a AS BIGINT)
           END AS uplift_ppm
    FROM arms ORDER BY segment
    """,
    tags=("experiment", "uplift", "stats", "A-family"),
)
def experiment_uplift_by_segment(spark, sf_dir):
    """SEGMENTED UPLIFT READOUT — the heterogeneous-treatment-effect
    table an experiment review reads after the topline: users segment
    by activity volume (fixed engine-neutral thresholds), the outcome
    is the deterministic "high-value user" flag (lifetime purchase
    cents ≥ 150k), and each segment reports both arms' exact rates and
    their difference in integer ppm (uplift = already-floored rate
    integers subtracted — no floor-of-negative ambiguity between
    engines even when B loses a segment).

    Scale shape: ONE user-keyed aggregate builds (arm, segment,
    outcome) per user, then a |segments|-row rollup — the same
    two-aggregate shape as experiment_cuped_adjusted; adding segments
    or outcome definitions adds columns, never shuffles."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
            ).otherwise(0)
        ).alias("spend_c"),
    )
    seg = per_user.select(
        F.expr(_ARM_SQL).alias("arm"),
        F.when(F.col("n_events") >= _SEG_BOUNDS[1], "high")
        .when(F.col("n_events") >= _SEG_BOUNDS[0], "mid")
        .otherwise("low")
        .alias("segment"),
        F.when(F.col("spend_c") >= _UPLIFT_SPEND_CENTS, 1)
        .otherwise(0)
        .alias("outcome"),
    )
    arms = seg.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("outcome")).otherwise(0))
        .cast("bigint")
        .alias("pos_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("outcome")).otherwise(0))
        .cast("bigint")
        .alias("pos_b"),
    )
    # NULL, not an error, when a tiny segment lands all its users in
    # one arm (possible at small SFs and under real-world skew)
    rate_a = F.when(
        F.col("n_a") > 0,
        (
            F.col("pos_a").cast("decimal(38,0)")
            * F.expr(_PM)
            / F.col("n_a").cast("decimal(38,0)")
        ).cast("bigint"),
    )
    rate_b = F.when(
        F.col("n_b") > 0,
        (
            F.col("pos_b").cast("decimal(38,0)")
            * F.expr(_PM)
            / F.col("n_b").cast("decimal(38,0)")
        ).cast("bigint"),
    )
    return arms.select(
        "segment",
        "n_a",
        "n_b",
        "pos_a",
        "pos_b",
        rate_a.alias("rate_a_ppm"),
        rate_b.alias("rate_b_ppm"),
        (rate_b - rate_a).cast("bigint").alias("uplift_ppm"),
    ).orderBy("segment")


@register(
    "stats_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS HUGEINT) AS o
      FROM documents GROUP BY lang, source
    ),
    marg AS (
      SELECT c.lang, c.source, c.o,
             r.r, s.c AS cc, t.n
      FROM cells c
      JOIN (SELECT lang, CAST(SUM(o) AS HUGEINT) AS r FROM cells
            GROUP BY lang) r USING (lang)
      JOIN (SELECT source, CAST(SUM(o) AS HUGEINT) AS c FROM cells
            GROUP BY source) s USING (source)
      CROSS JOIN (SELECT CAST(SUM(o) AS HUGEINT) AS n FROM cells) t
    ),
    contrib AS (
      SELECT n,
             CAST(FLOOR(
               (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                - CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))
               * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))
               * 1000000.0
               / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                  * CAST(cc AS DOUBLE))) AS BIGINT) AS cell_micro
      FROM marg
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS l
      FROM cells
    )
    SELECT CAST(MAX(c.n) AS BIGINT) AS n,
           d.k AS n_langs, d.l AS n_sources,
           (d.k - 1) * (d.l - 1) AS dof,
           CAST(SUM(c.cell_micro) AS BIGINT) AS chi2_micro,
           round(sqrt((CAST(SUM(c.cell_micro) AS DOUBLE) / 1000000.0)
                      / (CAST(MAX(c.n) AS DOUBLE)
                         * CAST(least(d.k, d.l) - 1 AS DOUBLE))),
                 6) AS cramers_v
    FROM contrib c, dims d
    GROUP BY d.k, d.l
    """,
    tags=("stats", "hypothesis-test", "independence", "A-family"),
)
def stats_chi2_independence(spark, sf_dir):
    """χ² TEST OF INDEPENDENCE (lang × source on the corpus) — the
    categorical-association gate a curation pipeline runs before
    stratifying on a column pair ("is language independent of source,
    or will per-source sampling skew languages?").  Per-cell
    contributions (oᵢⱼ·N − rᵢ·cⱼ)²/(N·rᵢ·cⱼ) are computed in doubles
    FROM EXACT INTEGER margins with identical IEEE trees on both
    engines, floored to integer micro-units, and summed as integers —
    order-free summation, so the 80-cell reduce is deterministic where
    a float Σ would depend on aggregation order.  (The all-integer
    clearing used elsewhere would need N⁴ precision — past DECIMAL(38)
    at corpus scale — so this is the deliberate exception documented
    by the determinism contract: doubles only inside a single row,
    integers across rows.)  Cramér's V rides the same exact sums.

    Scale shape: ONE map-side-combined (lang, source) count aggregate,
    two tiny margin rollups joined back on the |cells| table, a scalar
    reduce.  Adding a dimension pair is another 3-aggregate pass."""
    d = table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("o")
    )
    r = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    s = cells.groupBy("source").agg(F.sum("o").alias("cc"))
    t = cells.agg(F.sum("o").alias("n"))
    marg = (
        cells.join(F.broadcast(r), "lang")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(t))
    )
    contrib = marg.select(
        "n",
        F.expr(
            """
            CAST(FLOOR(
              (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
               - CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))
              * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))
              * 1000000.0
              / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                 * CAST(cc AS DOUBLE))) AS BIGINT)
            """
        ).alias("cell_micro"),
    )
    dims = cells.agg(
        F.count_distinct("lang").cast("bigint").alias("k"),
        F.count_distinct("source").cast("bigint").alias("l"),
    )
    agg = contrib.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("cell_micro").cast("bigint").alias("chi2_micro"),
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        "n",
        F.col("k").alias("n_langs"),
        F.col("l").alias("n_sources"),
        ((F.col("k") - 1) * (F.col("l") - 1)).cast("bigint").alias("dof"),
        "chi2_micro",
        F.round(
            F.expr(
                """
                sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)
                     / (CAST(n AS DOUBLE)
                        * CAST(least(k, l) - 1 AS DOUBLE)))
                """
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "stats_welch_ttest",
    oracle=f"""
    WITH vals AS (
      SELECT {_ARM_DUCK} AS arm,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    suff AS (
      SELECT arm,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(v) AS HUGEINT) AS s,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS ss
      FROM vals GROUP BY arm
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS n1,
        MAX(CASE WHEN arm = 'A' THEN s END) AS s1,
        MAX(CASE WHEN arm = 'A' THEN ss END) AS ss1,
        MAX(CASE WHEN arm = 'B' THEN n END) AS n2,
        MAX(CASE WHEN arm = 'B' THEN s END) AS s2,
        MAX(CASE WHEN arm = 'B' THEN ss END) AS ss2
      FROM suff
    ),
    terms AS (
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             CAST(s1 AS BIGINT) AS sum1_cents,
             CAST(s2 AS BIGINT) AS sum2_cents,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
             (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)
                * CAST(n1 AS DOUBLE)) AS se1_sq,
             (CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)
              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)
                * CAST(n2 AS DOUBLE)) AS se2_sq
      FROM wide
    )
    SELECT n1, n2, sum1_cents, sum2_cents,
           round(m1 - m2, 6) AS mean_diff_cents,
           round((m1 - m2) / sqrt(se1_sq + se2_sq), 6) AS t_stat,
           round((se1_sq + se2_sq) * (se1_sq + se2_sq)
                 / (se1_sq * se1_sq / (CAST(n1 AS DOUBLE) - 1.0)
                    + se2_sq * se2_sq / (CAST(n2 AS DOUBLE) - 1.0)),
                 6) AS welch_df
    FROM terms
    """,
    tags=("stats", "hypothesis-test", "ttest", "A-family"),
)
def stats_welch_ttest(spark, sf_dir):
    """WELCH'S UNEQUAL-VARIANCE t-TEST — the default two-sample mean
    test (pooled-variance Student's t silently assumes equal spread;
    Welch is what every experimentation platform actually computes):
    both arms reduce to exact integer sufficient statistics (n, Σx,
    Σx² in HUGEINT/DECIMAL(38,0) — cents² sums clear int64 at scale),
    and the t statistic plus the Welch–Satterthwaite effective degrees
    of freedom apply identical IEEE expression trees to those integers
    on both engines (round 6), the same doubles-only-inside-one-row
    discipline as stats_anova_oneway.

    Scale shape: ONE map-side-combined two-group aggregate over the
    scan, a 1-row combine.  Adding arms or metrics adds columns."""
    e = table(spark, sf_dir, "events")
    vals = e.filter(F.col("event_type") == "purchase").select(
        F.expr(_ARM_SQL).alias("arm"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
    )
    suff = vals.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("v").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("ss"),
    )
    wide = suff.agg(
        *[
            F.max(F.when(F.col("arm") == a, F.col(c))).alias(f"{c}{i}")
            for i, a in ((1, "A"), (2, "B"))
            for c in ("n", "s", "ss")
        ]
    )
    _se_sq = (
        "(CAST(n{i} AS DOUBLE) * CAST(ss{i} AS DOUBLE)"
        " - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
        " / (CAST(n{i} AS DOUBLE) * (CAST(n{i} AS DOUBLE) - 1.0)"
        " * CAST(n{i} AS DOUBLE))"
    )
    terms = wide.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("s1").cast("bigint").alias("sum1_cents"),
        F.col("s2").cast("bigint").alias("sum2_cents"),
        F.expr("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)").alias("m1"),
        F.expr("CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)").alias("m2"),
        F.expr(_se_sq.format(i=1)).alias("se1_sq"),
        F.expr(_se_sq.format(i=2)).alias("se2_sq"),
    )
    return terms.select(
        "n1",
        "n2",
        "sum1_cents",
        "sum2_cents",
        F.round(F.expr("m1 - m2"), 6).alias("mean_diff_cents"),
        F.round(
            F.expr("(m1 - m2) / sqrt(se1_sq + se2_sq)"), 6
        ).alias("t_stat"),
        F.round(
            F.expr(
                "(se1_sq + se2_sq) * (se1_sq + se2_sq)"
                " / (se1_sq * se1_sq / (CAST(n1 AS DOUBLE) - 1.0)"
                "    + se2_sq * se2_sq / (CAST(n2 AS DOUBLE) - 1.0))"
            ),
            6,
        ).alias("welch_df"),
    )


@register(
    "stats_spearman_rank_corr",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS b
      FROM events GROUP BY user_id
    ),
    ra AS (
      SELECT a AS val,
             CAST(2 * (SUM(cnt) OVER (ORDER BY a) - cnt) + cnt + 1
                  AS HUGEINT) AS r2
      FROM (SELECT a, COUNT(*) AS cnt FROM per_user GROUP BY a)
    ),
    rb AS (
      SELECT b AS val,
             CAST(2 * (SUM(cnt) OVER (ORDER BY b) - cnt) + cnt + 1
                  AS HUGEINT) AS r2
      FROM (SELECT b, COUNT(*) AS cnt FROM per_user GROUP BY b)
    ),
    ranked AS (
      SELECT ra.r2 AS x, rb.r2 AS y
      FROM per_user u JOIN ra ON ra.val = u.a JOIN rb ON rb.val = u.b
    ),
    suff AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS spearman_rho
    FROM suff
    """,
    tags=("stats", "correlation", "rank", "A-family"),
)
def stats_spearman_rank_corr(spark, sf_dir):
    """SPEARMAN RANK CORRELATION between per-user activity volume and
    spend — the nonparametric monotone-association measure (robust to
    the heavy-tailed spend distribution that wrecks Pearson): both
    variables convert to EXACT tie-averaged ranks in doubled-integer
    form (a tie group at rank [s, s+c−1] has 2·r̄ = 2·below + c + 1 —
    the Mann–Whitney device), and ρ is Pearson on those integer ranks:
    six exact DECIMAL(38,0) sufficient sums, one double expression
    with identical IEEE trees both sides, round 6.

    Scale shape: one user-keyed rollup, one value-count aggregate +
    two-pass prefix scan PER VARIABLE for the rank maps (each
    |distinct values|-sized, joined back by value — AQE broadcasts
    them when small), one scalar combine.  No global window, no
    sort of the full user table."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("a"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("b"),
    )
    # |users|-sized rollup referenced by both rank maps AND the final
    # join — eager localCheckpoint so the event-corpus aggregation
    # runs once, not once per reference (same rationale and same
    # persist-rejected measurement as _with_cumulative).  No coalesce:
    # unlike _with_cumulative's |distinct value|-sized counts, this
    # table grows with the corpus, so a fixed partition cap would
    # throttle every consumer at scale (the kmv lesson).
    per_user = per_user.localCheckpoint()

    def rank_map(var):
        counts = per_user.groupBy(F.col(var).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c1")
        )
        cum = _with_cumulative(counts, ["c1"])
        return cum.select(
            F.col("v").alias(f"{var}_val"),
            (
                F.lit(2).cast("decimal(38,0)")
                * (
                    F.col("cum_c1").cast("decimal(38,0)")
                    - F.col("c1").cast("decimal(38,0)")
                )
                + F.col("c1").cast("decimal(38,0)")
                + F.lit(1).cast("decimal(38,0)")
            ).alias(f"{var}_r2"),
        )

    ranked = (
        per_user.join(rank_map("a"), per_user["a"] == F.col("a_val"))
        .join(rank_map("b"), per_user["b"] == F.col("b_val"))
        .select(F.col("a_r2").alias("x"), F.col("b_r2").alias("y"))
    )
    suff = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return suff.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.expr(
                """
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                """
            ),
            6,
        ).alias("spearman_rho"),
    )

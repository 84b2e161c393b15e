"""Structural identities of the round-9 statistical-test queries.

The oracle gate proves cross-engine equality; these tests prove the
MATH — the identities the statistics must satisfy regardless of data:
U₁ + U₂ = n₁·n₂, KS D ∈ [0, 10⁶] ppm, κ ≤ p₀, reliability bins
partition the corpus, uplift rows reconcile with the user population.
"""

from __future__ import annotations

from lakehouse_cdc_spark.plans import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_mannwhitney_u_identity(spark, sf_dir):
    [r] = _run("stats_mannwhitney_u", spark, sf_dir)
    # doubled-rank identity: U1 + U2 = n1*n2 (x2 on both sides)
    assert r.u1_x2 + r.u2_x2 == 2 * r.n1 * r.n2
    # doubled rank-sum of the POOLED sample: R1+R2 = n(n+1)/2, so
    # r1_x2 is bounded by the pooled total
    n = r.n1 + r.n2
    assert 0 < r.r1_x2 < n * (n + 1)
    assert r.tie_t >= 0


def test_ks_bounds_and_location(spark, sf_dir):
    [r] = _run("stats_ks_two_sample", spark, sf_dir)
    assert 0 <= r.d_ppm <= 1_000_000
    assert r.n1 > 0 and r.n2 > 0
    assert r.d_at_cents is not None


def test_anova_decomposition(spark, sf_dir):
    [r] = _run("stats_anova_oneway", spark, sf_dir)
    assert r.k >= 2 and r.n > r.k
    assert r.f_stat >= 0.0
    assert 0 <= r.eta_sq_ppm <= 1_000_000


def test_kappa_bounds(spark, sf_dir):
    [r] = _run("stats_cohens_kappa", spark, sf_dir)
    # observed agreement can never be below chance-corrected kappa
    assert r.kappa_ppm <= r.po_ppm <= 1_000_000
    assert 0 <= r.pe_ppm <= 1_000_000
    assert r.n_agree <= r.n
    # the two monotone raters agree far above chance on this corpus
    assert r.kappa_ppm > 0


def test_calibration_bins_partition_corpus(spark, sf_dir):
    rows = _run("stats_calibration_ece", spark, sf_dir)
    docs = REGISTRY["stats_calibration_ece"].fn.__globals__["table"](
        spark, sf_dir, "documents"
    ).count()
    assert sum(r.n for r in rows) == docs
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0 <= r.n_pos <= r.n
        assert 0 <= r.conf_ppm <= 1_000_000
        assert 0 <= r.acc_ppm <= 1_000_000
        # the ECE numerator is exactly |n_pos*1e6 - sum(conf)|; its
        # per-row bound is n * 1e6
        assert r.gap_weighted <= r.n * 1_000_000


def test_uplift_population_reconciles(spark, sf_dir):
    rows = _run("experiment_uplift_by_segment", spark, sf_dir)
    users = (
        REGISTRY["experiment_uplift_by_segment"].fn.__globals__["table"](
            spark, sf_dir, "events"
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_a + r.n_b for r in rows) == users
    for r in rows:
        if r.n_a == 0 or r.n_b == 0:  # tiny-SF segment: NULL rates
            assert r.uplift_ppm is None
            continue
        assert r.uplift_ppm == r.rate_b_ppm - r.rate_a_ppm
        assert 0 <= r.rate_a_ppm <= 1_000_000
        assert 0 <= r.rate_b_ppm <= 1_000_000

"""Fellegi–Sunter EM (plans/er_queries.py) — 128-bit widening.

Round-4 verdict item 5: the M-step sums Σ(n·w)·10^6 overflowed int64
past ~9e6 candidate pairs.  The accumulation now runs in
DECIMAL(38,0) (Spark) / HUGEINT (oracle); these tests pin one EM
iteration at an ADVERSARIAL 10^13-pair cell table against an exact
Python big-int reference, on BOTH engines, plus the ADVICE clamp
(posterior w must never exceed 10^6 even when ug ≈ 0).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.er_queries import (
    _EM_INIT,
    _em_iter_spark,
    _em_iter_sql,
)

# a 10^13-pair corpus: far beyond the old ~9e6 int64 cliff
_CELLS = [
    # (a1, a2, a3, n)
    (1, 1, 1, 2_500_000_000_000),
    (1, 0, 1, 1_200_000_000_000),
    (0, 1, 0, 3_800_000_000_000),
    (0, 0, 0, 2_500_000_000_000),
]


def _reference(cells, params, iters=1):
    """Exact big-int replay of the integer-ppm EM recurrence."""
    M = 1_000_000
    for _ in range(iters):
        m1, u1, m2, u2, m3, u3, lam = params

        def prod(p1, p2, p3, a1, a2, a3):
            g1 = p1 if a1 else M - p1
            g2 = p2 if a2 else M - p2
            g3 = p3 if a3 else M - p3
            return (g1 * g2 // M) * g3 // M

        rows = []
        for a1, a2, a3, n in cells:
            mg = prod(m1, m2, m3, a1, a2, a3)
            ug = prod(u1, u2, u3, a1, a2, a3)
            den = max((lam * mg + (M - lam) * ug) // M, 1)
            w = min(M, (lam * mg) // den)
            rows.append((a1, a2, a3, n, w))

        def msum(j):
            num = sum(n * w for *a, n, w in rows if a[j - 1] == 1)
            den = max(sum(n * w for *_, n, w in rows), 1)
            return num * M // den

        def usum(j):
            num = sum(n * (M - w) for *a, n, w in rows if a[j - 1] == 1)
            den = max(sum(n * (M - w) for *_, n, w in rows), 1)
            return num * M // den

        lam2 = sum(n * w for *_, n, w in rows) // max(
            sum(n for *_, n, _ in rows), 1
        )
        params = (
            msum(1), usum(1), msum(2), usum(2), msum(3), usum(3), lam2,
        )
    return params


def _init_tuple():
    m, u, lam = _EM_INIT["m"], _EM_INIT["u"], _EM_INIT["lam"]
    return (m, u, m, u, m, u, lam)


def test_em_spark_exact_at_adversarial_pair_count(spark):
    cells = spark.createDataFrame(
        _CELLS, "a1 int, a2 int, a3 int, n long"
    )
    params = spark.range(1).select(
        *[F.lit(_EM_INIT["m"]).cast("bigint").alias(f"m{j}") for j in (1, 2, 3)],
        *[F.lit(_EM_INIT["u"]).cast("bigint").alias(f"u{j}") for j in (1, 2, 3)],
        F.lit(_EM_INIT["lam"]).cast("bigint").alias("lam"),
    )
    for it in (1, 2):
        params = _em_iter_spark(cells, params)
        got = params.collect()[0]
        want = _reference(_CELLS, _init_tuple(), iters=it)
        assert (
            got.m1, got.u1, got.m2, got.u2, got.m3, got.u3, got.lam
        ) == want, f"iter {it}"


def test_em_duckdb_matches_reference_at_adversarial_pair_count():
    values = ", ".join(f"({a},{b},{c},{n})" for a, b, c, n in _CELLS)
    m, u, lam = _EM_INIT["m"], _EM_INIT["u"], _EM_INIT["lam"]
    sql = f"""
    WITH cells AS (
      SELECT a1, a2, a3, CAST(n AS BIGINT) AS n
      FROM (VALUES {values}) t(a1, a2, a3, n)
    ),
    p0 AS (
      SELECT CAST({m} AS BIGINT) AS m1, CAST({u} AS BIGINT) AS u1,
             CAST({m} AS BIGINT) AS m2, CAST({u} AS BIGINT) AS u2,
             CAST({m} AS BIGINT) AS m3, CAST({u} AS BIGINT) AS u3,
             CAST({lam} AS BIGINT) AS lam
    ),{_em_iter_sql(1)},{_em_iter_sql(2)}
    SELECT m1, u1, m2, u2, m3, u3, lam FROM p2
    """
    got = duckdb.connect().execute(sql).fetchall()[0]
    want = _reference(_CELLS, _init_tuple(), iters=2)
    assert got == want


def test_em_posterior_clamped_when_u_vanishes(spark):
    """ADVICE: with ug ≈ 0 the // 1000000 rescale in the denominator
    lets the raw quotient overshoot 10^6; unclamped, n·(10^6 − w)
    goes negative and floor-vs-truncate division diverges between
    engines.  The clamp pins w at exactly 10^6."""
    cells = spark.createDataFrame(
        [(1, 1, 1, 1000)], "a1 int, a2 int, a3 int, n long"
    )
    # u so small the u-side geometric product underflows to 0 ppm
    params = spark.range(1).select(
        *[F.lit(999_999).cast("bigint").alias(f"m{j}") for j in (1, 2, 3)],
        *[F.lit(1).cast("bigint").alias(f"u{j}") for j in (1, 2, 3)],
        F.lit(900_000).cast("bigint").alias("lam"),
    )
    out = _em_iter_spark(cells, params).collect()[0]
    # all mass on the match side: m estimates at 10^6, u side must not
    # have gone NEGATIVE anywhere (it derives from n·(10^6 − w) ≥ 0)
    assert out.m1 == out.m2 == out.m3 == 1_000_000
    assert 0 <= out.u1 <= 1_000_000
    assert out.lam == 1_000_000

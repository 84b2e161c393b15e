"""Distributed prefix computations (cumsum / rank / running max) over
a TOTAL order, without an unpartitioned global window.

``Window.orderBy(...)`` with no ``partitionBy`` plans a
``SinglePartition`` exchange in Spark — the entire input funnels
through ONE task (WindowExec even logs "No Partition Defined for
Window operation! Moving all data to a single partition"), which is a
guaranteed straggler at scale no matter how the docstring wishes
otherwise.  The scalable shape is the classic two-pass scan:

1. assign every row a DETERMINISTIC coarse bucket that is monotone in
   the sort key (a value-range bucket — NOT ``spark_partition_id()``,
   whose assignment can differ between plan branches);
2. run the window PARTITIONED BY bucket (each task handles one
   bucket's rows);
3. aggregate one tiny row per bucket (sum / count / max) and combine
   each bucket with the aggregate of all STRICTLY LOWER buckets via a
   broadcast theta self-join over the bucket table (O(n_buckets²)
   pairs, driver-free, no window);
4. add the carried-in offset to the within-bucket result.

Steps 1–4 cost one hash shuffle (the per-bucket window) plus two
tiny broadcasts — the same plan a range-partitioned ``sortBy`` +
per-partition scan would hand-build, but deterministic and expressible
in pure DataFrame ops.

These helpers exist because ``plans/`` round 3 shipped six queries on
unpartitioned global windows; `tests/test_plans.py` now sweeps the
whole registry asserting the anti-pattern stays dead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_range_bucket(
    df: DataFrame,
    order_col: str | Column,
    n_buckets: int,
    bucket_col: str = "__bkt",
    null_bucket: int = 0,
) -> DataFrame:
    """Attach a deterministic value-range bucket that is monotone
    non-decreasing in ``order_col``: rows that compare lower on the
    sort key never land in a higher bucket, so per-bucket order +
    bucket order = total order.

    Boundaries are SAMPLED QUANTILES, not min/max interpolation: a
    ``percentile_approx`` aggregate over the order column yields the
    n_buckets-1 boundary values as a one-row array broadcast back
    onto the rows (plan stays fully lazy — no driver action), and a
    row's bucket is the count of boundaries strictly below its key.
    Linear min/max interpolation — the round-4 shape — degenerates on
    skewed order columns: 99% of rows in a narrow value range all land
    in one bucket and the "two-pass" window re-degenerates toward a
    single task.  Quantile boundaries equalize ROW counts per bucket
    whatever the value distribution.

    Correctness does NOT depend on where the boundaries fall (any
    monotone bucketing yields identical final results), so the
    quantile sketch's approximation is harmless; what IS load-bearing
    is that equal keys always share a bucket — guaranteed here because
    assignment is a pure comparison against the boundary values — so
    tie-break columns stay inside one partition's window.

    ``null_bucket`` is where NULL order values land (the sketch
    ignores them): bucket 0 reproduces ASC NULLS FIRST, bucket
    ``n_buckets - 1`` reproduces the NULLS LAST of a descending global
    window — the caller pairs it with the matching within-bucket null
    ordering.
    """
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    bounds = df.agg(
        F.percentile_approx(c.cast("double"), probs, F.lit(10_000)).alias(
            "__rb_bounds"
        )
    )
    rank = F.aggregate(
        F.col("__rb_bounds"),
        F.lit(0),
        lambda acc, b: acc + F.when(c.cast("double") > b, 1).otherwise(0),
    )
    bkt = (
        F.when(c.isNull(), F.lit(null_bucket))
        # empty input / all-NULL key: percentile_approx returns NULL
        .otherwise(F.coalesce(rank, F.lit(0)))
        .cast("int")
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(bucket_col, bkt)
        .drop("__rb_bounds")
    )


def ntile_two_pass(
    df: DataFrame,
    n: int,
    order_col: str,
    tiebreak_col: str,
    out_col: str,
    ascending: bool = True,
    n_buckets: int = 64,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_col [DESC], tiebreak_col)``
    without the SinglePartition global window: global position =
    within-range-bucket row_number + broadcast count of strictly-lower
    buckets, then NTILE's exact arithmetic — the first ``total % n``
    tiles take ``ceil(total/n)`` rows, the rest ``floor(total/n)`` —
    applied to the position with the broadcast total.  Integer math
    only, so assignments are bit-identical to NTILE in any engine.

    ``order_col`` must be numeric (descending order buckets on the
    negated value).  NULL order values follow the global window's
    semantics exactly: first under ascending (ASC NULLS FIRST), last
    under descending (DESC NULLS LAST).  Internal columns are dropped;
    the input schema plus ``out_col`` comes back."""
    key = F.col(order_col) if ascending else -F.col(order_col)
    b = with_range_bucket(
        df.withColumn("__nt_key", key),
        "__nt_key",
        n_buckets,
        null_bucket=0 if ascending else n_buckets - 1,
    )
    counts = b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    offsets = lower_bucket_agg(counts, "__bkt", "__cnt", "__off")
    # total from the tiny per-bucket table — never a third scan of df
    total = counts.agg(F.sum("__cnt").alias("__n"))
    null_key = (
        F.col("__nt_key").asc_nulls_first()
        if ascending
        else F.col("__nt_key").asc_nulls_last()
    )
    pos = (
        F.row_number().over(
            Window.partitionBy("__bkt").orderBy(null_key, tiebreak_col)
        )
        + F.col("__off")
    )
    base = F.floor(F.col("__n") / n)
    rem = F.col("__n") % n
    big_span = rem * (base + 1)
    tile = (
        F.when(
            F.col("__pos") <= big_span,
            F.floor((F.col("__pos") - 1) / (base + 1)) + 1,
        )
        .otherwise(rem + F.floor((F.col("__pos") - big_span - 1) / base) + 1)
        .cast("int")
    )
    return (
        b.join(F.broadcast(offsets), "__bkt")
        .withColumn("__pos", pos)
        .crossJoin(F.broadcast(total))
        .withColumn(out_col, tile)
        .drop("__nt_key", "__bkt", "__off", "__pos", "__n")
    )


def row_number_two_pass(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: list[str],
    out_col: str,
    ascending: bool = True,
    n_buckets: int = 64,
) -> DataFrame:
    """``ROW_NUMBER() OVER (ORDER BY order_col [DESC], tiebreaks)``
    without the SinglePartition global window: range-bucket on the
    (negated, if descending) numeric order column, row_number within
    each bucket, plus the broadcast count of strictly-lower buckets.
    ``out_col`` is BIGINT (positions exceed int32 long before a global
    window would have finished).  NULL order values follow the global
    window's semantics exactly: first under ascending (ASC NULLS
    FIRST), last under descending (DESC NULLS LAST).  Input schema +
    ``out_col`` returned; internals dropped."""
    key = F.col(order_col) if ascending else -F.col(order_col)
    b = with_range_bucket(
        df.withColumn("__rn_key", key),
        "__rn_key",
        n_buckets,
        null_bucket=0 if ascending else n_buckets - 1,
    )
    offsets = lower_bucket_agg(
        b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt")),
        "__bkt",
        "__cnt",
        "__off",
    )
    null_key = (
        F.col("__rn_key").asc_nulls_first()
        if ascending
        else F.col("__rn_key").asc_nulls_last()
    )
    order = [null_key] + [F.col(c) for c in tiebreak_cols]
    rn = (
        F.row_number().over(Window.partitionBy("__bkt").orderBy(*order))
        + F.col("__off")
    ).cast("bigint")
    return (
        b.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, rn)
        .drop("__rn_key", "__bkt", "__off")
    )


def lower_bucket_agg(
    per_bucket: DataFrame,
    bucket_col: str,
    value_col: str,
    out_col: str,
    combine: str = "sum",
    default=0,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """For every bucket, combine ``value_col`` over all STRICTLY lower
    buckets (the carry-in of a two-pass prefix scan): ``sum`` for
    cumulative sums / global ranks, ``max`` for running maxima.

    ``per_bucket`` has one row per bucket, so the theta self-join is
    an O(n_buckets²) broadcast — never a window, never a collect.
    ``default=None`` keeps the carry NULL for the lowest bucket (what
    a running-max wants); any other value coalesces (what a cumsum
    wants).  ``partition_cols`` scopes the carry: lower buckets only
    combine WITHIN the same partition key (one independent prefix
    scan per key — per_bucket then has one row per (key, bucket)).
    Returns (*partition_cols, bucket_col, out_col).
    """
    pcols = partition_cols or []
    t = per_bucket.select(
        *[F.col(c) for c in pcols], F.col(bucket_col).alias("__t_b")
    )
    p = per_bucket.select(
        *[F.col(c).alias(f"__p_{c}") for c in pcols],
        F.col(bucket_col).alias("__p_b"),
        F.col(value_col).alias("__p_v"),
    )
    agg = {"sum": F.sum, "max": F.max, "min": F.min, "count": F.sum}[combine]
    cond = F.col("__p_b") < F.col("__t_b")
    for c in pcols:
        cond = cond & F.col(f"__p_{c}").eqNullSafe(F.col(c))
    out = (
        t.join(F.broadcast(p), cond, "left")
        .groupBy(*pcols, "__t_b")
        .agg(agg("__p_v").alias(out_col))
    )
    if default is not None:
        out = out.withColumn(
            out_col, F.coalesce(F.col(out_col), F.lit(default).cast("bigint"))
        )
    return out.withColumnRenamed("__t_b", bucket_col)

"""As-of (backward) join — the temporal join Spark's API lacks.

Semantics: for each left row, attach the payload of the single right
row with the same key and the greatest event order strictly before the
left row's, or NULLs when no prior right row exists.  "Before" is
lexicographic on ``(time_col, *tiebreak)`` so the result is a pure
function of the input even under timestamp ties.

Implementation is the union-and-window formulation, NOT a join:
tag both sides, union them, and per key take ``last(payload_struct,
ignorenulls=True)`` over rows ``(unboundedPreceding, -1)`` in event
order, then keep the left rows.  The payload travels as ONE struct so
a right row whose payload *fields* are NULL still supersedes older
right rows (per-column ``last`` would stitch fields from different
rows).  Cost at any scale is exactly one hash-partition shuffle of
|L|+|R| rows and one sort — no join fan-out, and no range-condition
BroadcastNestedLoop (which is what Catalyst plans for the equivalent
``t_r < t_l`` theta join); skewed keys degrade into AQE-splittable
sort spills rather than quadratic probe loops.  This is the standard
scale formulation (pandas ``merge_asof`` semantics, distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    tiebreak: list[str],
    payload: dict[str, str],
) -> DataFrame:
    """Backward as-of join; ``payload`` maps right-side source column →
    output alias.  Returns all left columns + the aliased payload of
    the latest strictly-prior right row per key (NULL if none).

    ``tiebreak`` must make ``(time_col, *tiebreak)`` unique across the
    union (e.g. a global event id) — that is what makes "strictly
    prior" well defined and the result deterministic.
    """
    order_cols = [time_col, *tiebreak]
    packed = F.struct(
        *[F.col(src).alias(alias) for src, alias in payload.items()]
    )
    r_tagged = right.select(
        *on, *order_cols, packed.alias("__asof"), F.lit(0).alias("__side")
    )
    l_tagged = left.withColumn("__asof", F.lit(None).cast(
        dict(r_tagged.dtypes)["__asof"]
    )).withColumn("__side", F.lit(1))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u = u.withColumn("__asof", F.last("__asof", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    for alias in payload.values():
        out = out.withColumn(alias, F.col("__asof").getField(alias))
    return out.drop("__asof", "__side")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    tiebreak: list[str],
    payload: dict[str, str],
) -> DataFrame:
    """Nearest as-of join: attach the right row minimizing the absolute
    time distance in EITHER direction (pandas ``merge_asof
    direction='nearest'``); equal distances resolve to the earlier
    right row, so the result is deterministic.

    Same union-and-window machinery as the backward form, run in both
    directions: ``last`` over (unboundedPreceding, -1) gives the
    closest prior candidate, ``first`` over (1, unboundedFollowing)
    the closest following one, and a row-local integer comparison of
    microsecond distances picks the winner.  Still exactly ONE
    hash-partition shuffle of |L|+|R| rows — the second window reuses
    the first's partitioning and sort."""
    order_cols = [time_col, *tiebreak]
    packed = F.struct(
        F.unix_micros(F.col(time_col)).alias("__t_us"),
        *[F.col(src).alias(alias) for src, alias in payload.items()],
    )
    r_tagged = right.select(
        *on, *order_cols, packed.alias("__cand"), F.lit(0).alias("__side")
    )
    l_tagged = left.withColumn(
        "__cand", F.lit(None).cast(dict(r_tagged.dtypes)["__cand"])
    ).withColumn("__side", F.lit(1))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    base = Window.partitionBy(*on).orderBy(*order_cols)
    bwd = F.last("__cand", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = F.first("__cand", ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    u = u.withColumn("__bwd", bwd).withColumn("__fwd", fwd)
    t_us = F.unix_micros(F.col(time_col))
    d_bwd = F.abs(t_us - F.col("__bwd.__t_us"))
    d_fwd = F.abs(F.col("__fwd.__t_us") - t_us)
    pick = (
        F.when(F.col("__bwd").isNull(), F.col("__fwd"))
        .when(F.col("__fwd").isNull(), F.col("__bwd"))
        .when(d_bwd <= d_fwd, F.col("__bwd"))  # tie -> earlier
        .otherwise(F.col("__fwd"))
    )
    out = u.filter(F.col("__side") == 1).withColumn("__pick", pick)
    out = out.withColumn(
        "__delta_us", F.col("__pick.__t_us") - t_us
    )
    for alias in payload.values():
        out = out.withColumn(alias, F.col("__pick").getField(alias))
    return out.withColumnRenamed("__delta_us", "asof_delta_us").drop(
        "__cand", "__side", "__bwd", "__fwd", "__pick"
    )

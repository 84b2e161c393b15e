"""Snapshot diff — change-data-feed between two table versions.

The reference replays a change stream forward (spark_batch.py:266-280);
the inverse operation — given two snapshots of the same keyed table,
recover the minimal change set that transforms one into the other —
is what lakehouse CDF readers (Iceberg changelog scans, Delta CDF)
serve to downstream consumers.  This module derives it relationally:

    diff = full_outer_join(before, after, keys)
           → only-after   ⇒ insert   (row = after values)
           → only-before  ⇒ delete   (row = before values)
           → both, differ ⇒ update   (row = after values)
           → both, equal  ⇒ no row

One shuffle on the key columns for both sides, classification and
column selection are map-side.  At 100 TB both snapshots partition by
key hash; if the physical layouts are bucketed on the key
(catalog.write_bucketed) the join plans with zero additional shuffle.
Equality is null-safe per column (NULL == NULL for diff purposes), so
the emitted change set is exactly the rows a MERGE would have to
touch — replaying it through apply_changes(before) reproduces after
(property-tested in tests/test_cdc.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    change_col: str = "_change_type",
) -> DataFrame:
    """Minimal change set turning ``before`` into ``after``.

    Returns one row per changed key with the snapshot's value columns
    (after-image for insert/update, before-image for delete) plus
    ``change_col`` ∈ {'insert', 'update', 'delete'}.
    """
    value_cols = [c for c in after.columns if c not in keys]
    if set(before.columns) != set(after.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(before.columns)} "
            f"vs {sorted(after.columns)}"
        )

    b = before.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in value_cols],
        F.lit(True).alias("__in_before"),
    )
    a = after.select(
        *[F.col(k).alias(f"__ak_{k}") for k in keys],
        *[F.col(c).alias(f"__a_{c}") for c in value_cols],
        F.lit(True).alias("__in_after"),
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"__bk_{k}").eqNullSafe(F.col(f"__ak_{k}")) for k in keys],
    )
    joined = b.join(a, cond, "full_outer")

    any_differs = reduce(
        lambda x, y: x | y,
        [
            ~F.col(f"__b_{c}").eqNullSafe(F.col(f"__a_{c}"))
            for c in value_cols
        ],
        F.lit(False),
    )
    change = (
        F.when(F.col("__in_before").isNull(), F.lit("insert"))
        .when(F.col("__in_after").isNull(), F.lit("delete"))
        .when(any_differs, F.lit("update"))
    )  # both present and equal → NULL → dropped below

    out_keys = [
        F.coalesce(F.col(f"__bk_{k}"), F.col(f"__ak_{k}")).alias(k)
        for k in keys
    ]
    out_vals = [
        F.when(F.col("__in_after").isNull(), F.col(f"__b_{c}"))
        .otherwise(F.col(f"__a_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return (
        joined.withColumn(change_col, change)
        .filter(F.col(change_col).isNotNull())
        .select(*out_keys, *out_vals, F.col(change_col))
    )

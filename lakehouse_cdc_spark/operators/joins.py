"""Join family exposed by the engine.

The reference's join surface (SURVEY §2.3) is the MERGE equi-join
(``src/processor/spark_batch.py:269-280``), the guarded MERGE
theta-join (``src/processor/spark_exactly_once.py:494``), and a
driver-side key-set intersection / per-key probe loop
(``src/validation/validation.py:563, 389-410``).  The per-key
``collect()`` loop is the anti-pattern these wrappers remove: one
distributed semi-join replaces N driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Plain equi-join; Catalyst picks broadcast/SMJ/shuffled-hash."""
    return left.join(right, on=on, how=how)


def broadcast_join(left: DataFrame, small_right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join with an explicit broadcast hint on the small side.

    At 100 TB the fact side never moves: broadcasting a dimension
    (region/nation-sized) turns a full shuffle of the fact table into a
    map-side hash join.
    """
    return left.join(F.broadcast(small_right), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (no right columns).

    Replaces the reference's per-key existence probe loop
    (``src/validation/validation.py:389-410``).
    """
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` without a match in ``right``."""
    return left.join(right, on=on, how="left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key into
    ``salt_buckets`` sub-keys and replicate the right side across all
    buckets, so one hot key spreads over N tasks instead of stalling
    one.

    AQE's skew-join split handles most cases automatically (enabled in
    session.py); explicit salting remains necessary when the skewed
    key feeds an *aggregation* or when the join sits under an operator
    AQE can't split.  Cost: right side is duplicated ×buckets — use
    for dimension-sized right sides only.

    Only ``inner`` and ``left`` are supported: with the right side
    replicated, right/full-outer would emit one spurious null-extended
    row per bucket whose salted left slice had no match.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicating the right side breaks right/full-outer semantics"
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    buckets = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    salted_right = right.select("*", buckets)
    out = salted_left.join(salted_right, on=[key, "__salt"], how=how)
    return out.drop("__salt")

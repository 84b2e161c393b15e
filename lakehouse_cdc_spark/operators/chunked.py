"""Bounded-frame windows over LOW-CARDINALITY partition keys.

``Window.partitionBy(key)`` parallelizes exactly ``|distinct key|``
ways: with 5 event types, the per-key sort behind a rolling frame runs
as 5 tasks no matter how many executors exist, and each task's sort
grows super-linearly with data volume (the round-12 sf1 profile
measured ts_anomaly_zscore at 3.03x wall for 10x data for exactly
this reason — at 100 TB one task would sort 20 TB).

For TRAILING frames bounded by R rows (``ROWS BETWEEN R PRECEDING AND
x``), the fix is the classic chunk-with-carry scan:

1. assign each row a coarse bucket MONOTONE in the order key within
   its partition key (e.g. ``date_trunc('day', ts)`` when ordering by
   ts) — parallelism becomes |key| x |buckets|;
2. from a tiny per-(key, bucket) row-count table, derive which
   trailing rows of which earlier buckets each bucket needs so every
   row still sees its full R preceding rows: bucket p contributes to
   bucket b iff fewer than R rows lie strictly between them, and then
   exactly its last ``R - rows_between(p, b)`` rows (this walks back
   across sparse and empty buckets until R rows are covered, so
   bucket sizing never affects correctness, only efficiency);
3. duplicate those carry rows into their target bucket, flagged;
4. run the SAME window frame partitioned by (key, bucket) and drop
   the flagged rows — their own frames are incomplete, but they are
   present only to complete the frames of the real rows.

Cost: two full-data hash exchanges on (key, bucket) (the carry
row_number and the final window) plus two tiny metadata shuffles,
versus ONE exchange for the naive form — but every stage runs at
|key| x |buckets| parallelism instead of |key|, which is the
difference between a 30-second job and a dead executor at 100 TB.
Carry overhead is <= R duplicated rows per (key, bucket).

A LOOKAHEAD frame bounded by R rows (lead(), ``ROWS BETWEEN x AND
R FOLLOWING``) is the same problem under the reversed order: pass the
descending order columns and the frame's following bound as R.

RANGE frames bounded by the order VALUE (e.g. a trailing 30-day sum)
use :func:`with_trailing_range_carry` — the carry rule is value-based
and needs NO metadata table: each row knows from its own order value
which later buckets' frames can still reach it (any bucket starting
within ``range_width`` of the row), so the carry is a pure map-side
explode.  Pick ``bucket_span >= range_width`` to bound the
duplication factor at 2x.

Rank-arithmetic windows (ntile) over low-cardinality keys don't need
a carry at all: :func:`ntile_keyed_two_pass` is the keyed counterpart
of ``operators/prefix.ntile_two_pass`` — per-key quantile range
buckets, within-(key, bucket) row_number, per-key lower-bucket
offsets from a tiny metadata table, then NTILE's exact integer
arithmetic against the per-key total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_trailing_carry(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str | Column],
    max_preceding: int,
    bucket: Column,
    bucket_col: str = "__b",
    carry_col: str = "__carry",
) -> DataFrame:
    """Return ``df`` plus carry duplicates so that trailing ROWS
    frames up to ``max_preceding`` rows deep, windowed by
    ``(key_cols..., bucket_col)`` and ordered by ``order_cols``, equal
    the same frames windowed by ``key_cols`` alone.

    ``bucket`` must be monotone non-decreasing in the ``order_cols``
    ordering within each key (a truncation of the leading order column
    — ``date_trunc('day', ts)`` — is the usual choice); rows that
    compare equal on the full order key must land in the same bucket,
    which any deterministic function of the order columns guarantees.

    Output columns: ``df``'s columns + ``bucket_col`` + ``carry_col``
    (1 on duplicated carry rows).  The caller applies its window
    aggregates with ``Window.partitionBy(*key_cols, bucket_col)`` and
    then filters ``carry_col == 0``; frames must not reach further
    back than ``max_preceding`` rows or further forward than row 0.

    NULL keys are supported (the metadata joins are null-safe);
    ``bucket`` / the order columns must be NON-NULL — a NULL bucket
    would silently opt its rows out of the carry protocol and their
    neighbors' frames.
    """
    if max_preceding < 1:
        raise ValueError(f"max_preceding must be >= 1, got {max_preceding}")
    for reserved in (bucket_col, carry_col):
        if reserved in df.columns:
            raise ValueError(f"column {reserved!r} already present")
    d = df.withColumn(bucket_col, bucket)

    # tiny metadata: rows per (key, bucket), cumulative within key
    meta = (
        d.groupBy(*key_cols, bucket_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__cum",
            F.sum("__cnt").over(
                Window.partitionBy(*key_cols).orderBy(bucket_col)
            ),
        )
    )
    # (source bucket p -> target bucket b) pairs: p contributes carry
    # to b iff rows strictly between them number < max_preceding;
    # quota = how many of p's trailing rows b still needs.  Bucket-
    # level theta join over the tiny metadata table — driver-free.
    src = meta.select(
        *[F.col(k).alias(f"__pk{i}") for i, k in enumerate(key_cols)],
        F.col(bucket_col).alias("__p_src"),
        F.col("__cum").alias("__cum_src"),
    )
    tgt = meta.select(
        *key_cols,
        F.col(bucket_col).alias("__p_tgt"),
        (F.col("__cum") - F.col("__cnt")).alias("__cum_before_tgt"),
    )
    between = F.col("__cum_before_tgt") - F.col("__cum_src")
    pairs = (
        tgt.join(
            src,
            [tgt[k].eqNullSafe(src[f"__pk{i}"]) for i, k in enumerate(key_cols)]
            + [src["__p_src"] < tgt["__p_tgt"]],
        )
        .filter(between < max_preceding)
        .select(
            *[F.col(f"__pk{i}") for i in range(len(key_cols))],
            "__p_src",
            "__p_tgt",
            (F.lit(max_preceding) - between).alias("__quota"),
        )
    )

    # position-from-end within each (key, bucket) — the rows eligible
    # to be carried forward.  Partitioned by (key, bucket): parallel.
    rev = [
        F.desc(c) if isinstance(c, str) else _reversed(c) for c in order_cols
    ]
    rn_desc = F.row_number().over(
        Window.partitionBy(*key_cols, bucket_col).orderBy(*rev)
    )
    d_rn = d.withColumn("__rnd", rn_desc)
    carried = (
        d_rn.join(
            F.broadcast(pairs),
            [d_rn[k].eqNullSafe(pairs[f"__pk{i}"]) for i, k in enumerate(key_cols)]
            + [d_rn[bucket_col] == pairs["__p_src"]],
        )
        .filter(F.col("__rnd") <= F.col("__quota"))
        .select(
            *df.columns,
            F.col("__p_tgt").alias(bucket_col),
            F.lit(1).alias(carry_col),
        )
    )
    base = d.select(*df.columns, bucket_col, F.lit(0).alias(carry_col))
    return base.unionByName(carried)


def lead_one_bucketed(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    lead_col: str,
    bucket: Column,
    out_col: str,
    bucket_col: str = "__b",
) -> DataFrame:
    """``LEAD(lead_col, 1) OVER (PARTITION BY keys ORDER BY
    order_cols)`` without a |keys|-task window: lead within
    ``(keys..., bucket)``, then patch each bucket's LAST row (whose
    in-bucket lead is NULL) with the next non-empty bucket's first
    ``lead_col`` from a tiny |keys|x|buckets| metadata table (bucket
    heads via lexicographic struct-min, next head via a metadata-level
    lead, broadcast back with a null-safe key join — a NULL key is a
    legitimate window group).  Each key's global last row keeps NULL.

    ``bucket`` must be monotone non-decreasing in the ``order_cols``
    ordering within each key and non-null; ``order_cols`` must be
    plain column names (they index into a struct-min).  Returns
    ``df``'s columns + ``bucket_col`` + ``out_col``.
    """
    if bucket_col in df.columns or out_col in df.columns:
        raise ValueError(f"column {bucket_col!r}/{out_col!r} already present")
    d = df.withColumn(bucket_col, bucket)
    wb = Window.partitionBy(*key_cols, bucket_col).orderBy(*order_cols)
    # alias every struct field: lead_col may itself be an order column
    # (e.g. lead over the ordering timestamp), and duplicate field
    # names make getField ambiguous
    heads = d.groupBy(*key_cols, bucket_col).agg(
        F.min(
            F.struct(
                *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
                F.col(lead_col).alias("__lead"),
            )
        )
        .getField("__lead")
        .alias("__first")
    )
    wk = Window.partitionBy(*key_cols).orderBy(bucket_col)
    nh = heads.select(
        *[F.col(k).alias(f"__hk{i}") for i, k in enumerate(key_cols)],
        F.col(bucket_col).alias("__hb"),
        F.lead("__first").over(wk).alias("__next_head"),
    )
    d2 = d.withColumn("__nib", F.lead(lead_col).over(wb))
    return d2.join(
        F.broadcast(nh),
        [d2[k].eqNullSafe(nh[f"__hk{i}"]) for i, k in enumerate(key_cols)]
        + [d2[bucket_col] == nh["__hb"]],
        "left",
    ).select(
        *df.columns,
        bucket_col,
        F.coalesce("__nib", "__next_head").alias(out_col),
    )


def with_trailing_range_carry(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    range_width: int,
    bucket_span: int,
    bucket_col: str = "__b",
    carry_col: str = "__carry",
) -> DataFrame:
    """Return ``df`` plus carry duplicates so that trailing RANGE
    frames up to ``range_width`` deep on the NUMERIC ``order_col``
    (``RANGE BETWEEN range_width PRECEDING AND CURRENT ROW`` or
    shallower), windowed by ``(key_cols..., bucket_col)``, equal the
    same frames windowed by ``key_cols`` alone.

    Bucket = ``floor(order_col / bucket_span)``; ``order_col`` must be
    numeric and NON-NULL (a NULL value would opt the row out of the
    carry protocol).  Unlike the ROWS-frame carry, no metadata pass is
    needed: a row at order value o
    can still be reached by frames of rows in any bucket whose span
    starts at most ``range_width`` after o, so the row is exploded
    into buckets ``bucket(o)+1 .. bucket(o + range_width)`` — a pure
    map-side operation.  Duplication factor is
    ``1 + ceil(range_width / bucket_span)``; choose
    ``bucket_span >= range_width`` to keep it <= 2x (parallelism vs
    duplication is the only trade, never correctness — sparse or
    empty buckets just waste a few carried rows).

    Output columns: ``df``'s + ``bucket_col`` (long) + ``carry_col``
    (1 on duplicates).  The caller windows by
    ``(*key_cols, bucket_col)`` with its RANGE frame over
    ``order_col`` and then filters ``carry_col == 0``.
    """
    if range_width < 0:
        raise ValueError(f"range_width must be >= 0, got {range_width}")
    if bucket_span < 1:
        raise ValueError(f"bucket_span must be >= 1, got {bucket_span}")
    for reserved in (bucket_col, carry_col):
        if reserved in df.columns:
            raise ValueError(f"column {reserved!r} already present")
    o = F.col(order_col)
    own = F.floor(o / bucket_span).cast("long")
    last = F.floor((o + range_width) / bucket_span).cast("long")
    base = df.withColumn(bucket_col, own).withColumn(
        carry_col, F.lit(0)
    )
    # guard: sequence(a, b) with a > b generates a DESCENDING range in
    # Spark — rows whose reach ends in their own bucket must carry
    # nowhere (empty array -> explode drops them)
    targets = F.when(last > own, F.sequence(own + 1, last)).otherwise(
        F.expr("CAST(array() AS array<bigint>)")
    )
    carried = (
        df.withColumn("__tgt", F.explode(targets))
        .withColumn(bucket_col, F.col("__tgt").cast("long"))
        .withColumn(carry_col, F.lit(1))
        .drop("__tgt")
    )
    return base.unionByName(carried.select(*base.columns))


def ntile_keyed_two_pass(
    df: DataFrame,
    n: int,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    out_col: str,
    ascending: bool = True,
    n_buckets: int = 64,
) -> DataFrame:
    """``NTILE(n) OVER (PARTITION BY keys ORDER BY order_col [DESC],
    tiebreak_col)`` without a |keys|-task window: per-key position =
    within-(key, range-bucket) row_number + the count of the key's
    strictly-lower buckets, then NTILE's exact arithmetic — the first
    ``total % n`` tiles take ``ceil(total/n)`` rows, the rest
    ``floor(total/n)`` — against the key's broadcast total.  Integer
    math only: assignments are bit-identical to NTILE in any engine.

    Range-bucket boundaries are PER-KEY sampled quantiles (a tiny
    groupBy-percentile_approx aggregate broadcast back), so each key's
    rows spread across ~n_buckets buckets even when keys have disjoint
    value ranges; correctness never depends on where boundaries fall,
    only balance does.  ``order_col`` must be numeric and non-null
    (descending order buckets on the negated value); ``key_cols``
    must be non-null too — the metadata joins are by-name equi-joins,
    so NULL-keyed rows would silently drop from the output.
    """
    key = F.col(order_col) if ascending else -F.col(order_col)
    d = df.withColumn("__nt_key", key)
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    bounds = d.groupBy(*key_cols).agg(
        F.percentile_approx(
            F.col("__nt_key").cast("double"), probs, F.lit(10_000)
        ).alias("__rb_bounds")
    )
    rank = F.aggregate(
        F.col("__rb_bounds"),
        F.lit(0),
        lambda acc, bnd: acc
        + F.when(F.col("__nt_key").cast("double") > bnd, 1).otherwise(0),
    )
    b = (
        d.join(F.broadcast(bounds), key_cols)
        .withColumn("__bkt", F.coalesce(rank, F.lit(0)).cast("int"))
        .drop("__rb_bounds")
    )
    counts = b.groupBy(*key_cols, "__bkt").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wk = Window.partitionBy(*key_cols).orderBy("__bkt")
    offsets = counts.select(
        *key_cols,
        "__bkt",
        (F.sum("__cnt").over(wk) - F.col("__cnt")).alias("__off"),
    )
    totals = counts.groupBy(*key_cols).agg(F.sum("__cnt").alias("__n"))
    pos = (
        F.row_number().over(
            Window.partitionBy(*key_cols, "__bkt").orderBy(
                "__nt_key", tiebreak_col
            )
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
        b.join(F.broadcast(offsets), [*key_cols, "__bkt"])
        .withColumn("__pos", pos)
        .join(F.broadcast(totals), key_cols)
        .withColumn(out_col, tile)
        .drop("__nt_key", "__bkt", "__off", "__pos", "__n")
    )


def _reversed(c: Column) -> Column:
    """Best-effort direction flip for a Column order expression."""
    # Column sort expressions don't expose their direction; callers
    # passing Columns should pass the ASCENDING expression and let
    # this helper flip it.
    return c.desc()

"""Mergeable-sketch declared queries (round 3): Count-Min heavy
hitters and Bloom-filter join pruning.

Both sketches the reference has no equivalent for, but any
100 TB pipeline leans on: a Count-Min sketch bounds heavy-hitter
counting in O(depth × width) state no matter the key cardinality, and
a Bloom filter built from a join's small side prunes the fact scan
before the shuffle (the runtime filter Spark's
``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`` injects —
here built explicitly so the mechanics are on the oracle surface).

Determinism: every hash is md5-derived (``conv`` of a 60-bit prefix),
every aggregate is integer — both engines reproduce the sketches
bit-for-bit, so the ESTIMATES themselves are oracle-checked, not just
the exact counts they approximate.

Scale notes (100 TB): the Count-Min build is one map-side-combined
aggregation into ≤ depth×width cells (the shuffle moves the SKETCH,
not the keys — that is the whole point of a mergeable sketch); probes
broadcast the 1024-cell table.  The Bloom build aggregates ≤ m/32
bitmap words with ``bit_or`` partials; the probe side joins the
≤ 32-row bitmap broadcast, all map-side.  Neither operator's state
grows with data volume.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import register, table

_CM_DEPTH = 4
_CM_WIDTH = 256

# md5-derived hash row: bucket_d(key) = md5("d:key") 60-bit prefix mod width
_CM_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(d AS STRING), ':', CAST(k AS STRING))), "
    f"1, 15), 16, 10) AS BIGINT) % {_CM_WIDTH}"
)
_CM_DUCK = (
    "CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || CAST({key} AS VARCHAR)), "
    f"1, 15) AS BIGINT) % {_CM_WIDTH}"
)


@register(
    "sketch_countmin_heavy_hitters",
    oracle=f"""
    WITH keys AS (SELECT l_partkey AS k FROM lineitem),
    cells AS (
      SELECT d.d AS d, {_CM_DUCK.format(key="k")} AS b,
             CAST(COUNT(*) AS BIGINT) AS cell_cnt
      FROM keys, range(0, {_CM_DEPTH}) d(d)
      GROUP BY 1, 2
    ),
    true_top AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM keys GROUP BY k
      ORDER BY true_cnt DESC, k LIMIT 20
    ),
    probes AS (
      SELECT t.k, t.true_cnt, d.d AS d, {_CM_DUCK.format(key="t.k")} AS b
      FROM true_top t, range(0, {_CM_DEPTH}) d(d)
    )
    SELECT p.k AS part_key, p.true_cnt,
           MIN(c.cell_cnt) AS cm_est,
           MIN(c.cell_cnt) - p.true_cnt AS overcount
    FROM probes p JOIN cells c ON p.d = c.d AND p.b = c.b
    GROUP BY p.k, p.true_cnt
    """,
    tags=("sketch", "countmin", "A3-scale", "mergeable"),
)
def sketch_countmin_heavy_hitters(spark, sf_dir):
    """Count-Min sketch (depth 4 × width 256, md5-derived rows) over
    lineitem part keys, evaluated on the true top-20: est = min over
    depths of the hashed cell, with the guaranteed one-sided error
    (overcount ≥ 0) emitted as a column.  The build is ONE map-side-
    combined aggregation into ≤ 1024 cells — the shuffle moves the
    sketch, never the keys, so the operator's state is constant at any
    corpus size (the mergeable-sketch contract agg_hll shares).  The
    estimates themselves are oracle-checked: both engines derive the
    identical hash rows from md5, so cm_est matches bit-for-bit."""
    li = table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    depths = F.explode(F.array(*[F.lit(i) for i in range(_CM_DEPTH)])).alias("d")
    cells = (
        li.select("k", depths)
        .select("d", F.expr(_CM_SPARK).alias("b"))
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    true_top = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("k"))
        .limit(20)
    )
    probes = true_top.select("k", "true_cnt", depths).select(
        "k", "true_cnt", "d", F.expr(_CM_SPARK).alias("b")
    )
    return (
        probes.join(F.broadcast(cells), ["d", "b"])
        .groupBy("k", "true_cnt")
        .agg(F.min("cell_cnt").alias("cm_est"))
        .select(
            F.col("k").alias("part_key"),
            "true_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("true_cnt")).alias("overcount"),
        )
    )


_BF_BITS = 1024  # m
_BF_HASHES = 3  # k
_BF_WORD = 32  # bits per bitmap word (sign-safe in BIGINT everywhere)

_BF_POS_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(i AS STRING), '#', CAST(k AS STRING))), "
    f"1, 15), 16, 10) AS BIGINT) % {_BF_BITS}"
)
_BF_POS_DUCK = (
    "CAST('0x' || substr(md5(CAST(i.i AS VARCHAR) || '#' || CAST({key} AS VARCHAR)), "
    f"1, 15) AS BIGINT) % {_BF_BITS}"
)


@register(
    "sketch_bloom_join_prune",
    oracle=f"""
    WITH member AS (
      SELECT c_custkey AS k FROM customer
      WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0', '1')
    ),
    bloom AS (
      SELECT pos // {_BF_WORD} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BF_WORD} AS INT)) AS w_bits
      FROM (SELECT {_BF_POS_DUCK.format(key="m.k")} AS pos
            FROM member m, range(0, {_BF_HASHES}) i(i))
      GROUP BY 1
    ),
    probe AS (SELECT DISTINCT user_id AS k FROM events),
    flags AS (
      SELECT p.k,
             COALESCE((b.w_bits & (CAST(1 AS BIGINT) << CAST(pos % {_BF_WORD} AS INT)))
                      <> 0, FALSE) AS hit
      FROM (SELECT p.k, {_BF_POS_DUCK.format(key="p.k")} AS pos
            FROM probe p, range(0, {_BF_HASHES}) i(i)) p
      LEFT JOIN bloom b ON p.pos // {_BF_WORD} = b.word
    ),
    verdict AS (SELECT k, bool_and(hit) AS maybe FROM flags GROUP BY k),
    joined AS (
      SELECT v.k, v.maybe, (m.k IS NOT NULL) AS is_member
      FROM verdict v LEFT JOIN member m ON v.k = m.k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(COUNT(*) FILTER (WHERE is_member) AS BIGINT) AS n_member,
           CAST(COUNT(*) FILTER (WHERE maybe) AS BIGINT) AS n_maybe,
           CAST(COUNT(*) FILTER (WHERE NOT maybe) AS BIGINT) AS n_definite_no,
           CAST(COUNT(*) FILTER (WHERE maybe AND NOT is_member) AS BIGINT)
             AS n_false_pos,
           CAST(COUNT(*) FILTER (WHERE is_member AND NOT maybe) AS BIGINT)
             AS n_false_neg
    FROM joined
    """,
    tags=("sketch", "bloom", "J3-scale", "runtime-filter"),
)
def sketch_bloom_join_prune(spark, sf_dir):
    """Bloom-filter join pruning, built explicitly: the small side (a
    deterministic ~1/8 customer subset) is folded into a 1024-bit
    bloom bitmap (k=3 md5-derived positions, ``bit_or`` over ≤ 32
    bigint words — mergeable partials, map-side combined); the probe
    side (distinct event users) checks its 3 bits against the
    BROADCAST bitmap and splits into definite-no (skip the join) vs
    maybe (shuffle only these).  Emits the full confusion row —
    n_false_neg MUST be 0 (the Bloom guarantee, oracle-enforced),
    n_false_pos is the price of m=1024 at this fill factor.  At scale
    this is Spark's runtime bloom filter made visible: the fact-side
    shuffle shrinks by n_definite_no/n_probed with zero correctness
    risk."""
    member = (
        table(spark, sf_dir, "customer")
        .filter(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1).isin("0", "1")
        )
        .select(F.col("c_custkey").alias("k"))
    )
    hashes = F.explode(F.array(*[F.lit(i) for i in range(_BF_HASHES)])).alias("i")
    bloom = (
        member.select("k", hashes)
        .select(F.expr(_BF_POS_SPARK).alias("pos"))
        .select(
            (F.col("pos") / _BF_WORD).cast("bigint").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BF_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("w_bits"))
    )
    probe = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    ).distinct()
    flags = (
        probe.select("k", hashes)
        .select("k", F.expr(_BF_POS_SPARK).alias("pos"))
        .select(
            "k",
            (F.col("pos") / _BF_WORD).cast("bigint").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BF_WORD} AS INT))"
            ).alias("mask"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "k",
            F.coalesce(
                (F.col("w_bits").bitwiseAND(F.col("mask")) != 0), F.lit(False)
            ).alias("hit"),
        )
    )
    verdict = flags.groupBy("k").agg(F.expr("bool_and(hit)").alias("maybe"))
    joined = verdict.join(
        F.broadcast(member.withColumn("__m", F.lit(1))), "k", "left"
    ).select("k", "maybe", F.col("__m").isNotNull().alias("is_member"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.count(F.when(F.col("is_member"), 1)).alias("n_member"),
        F.count(F.when(F.col("maybe"), 1)).alias("n_maybe"),
        F.count(F.when(~F.col("maybe"), 1)).alias("n_definite_no"),
        F.count(F.when(F.col("maybe") & ~F.col("is_member"), 1)).alias("n_false_pos"),
        F.count(F.when(F.col("is_member") & ~F.col("maybe"), 1)).alias("n_false_neg"),
    )

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

from lakehouse_cdc_spark.operators.hints import runtime_sized
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
        runtime_sized(member.withColumn("__m", F.lit(1)), "membership"),
        "k",
        "left",
    ).select("k", "maybe", F.col("__m").isNotNull().alias("is_member"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.count(F.when(F.col("is_member"), 1)).alias("n_member"),
        F.count(F.when(F.col("maybe"), 1)).alias("n_maybe"),
        F.count(F.when(~F.col("maybe"), 1)).alias("n_definite_no"),
        F.count(F.when(F.col("maybe") & ~F.col("is_member"), 1)).alias("n_false_pos"),
        F.count(F.when(F.col("is_member") & ~F.col("maybe"), 1)).alias("n_false_neg"),
    )


# ------------------------------------------------------------------ KMV
# Bottom-k (KMV) distinct sketch per document source, used pairwise to
# estimate cross-source Jaccard overlap.  Beyer et al. 2007 ("On
# synopses for distinct-value estimation"); the pairwise-similarity use
# is the standard KMV set-operation extension.

_KMV_K = 64

_KMV_H_SPARK = (
    "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"
)
_KMV_H_DUCK = "CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)"


@register(
    "sketch_kmv_jaccard",
    bench=True,
    oracle=f"""
    WITH hs AS (
      SELECT DISTINCT source, {_KMV_H_DUCK} AS h FROM documents
    ),
    bk AS (
      SELECT source, h FROM (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hs) WHERE rn <= {_KMV_K}
    ),
    ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM hs GROUP BY source),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2, a.n AS n1, b.n AS n2
      FROM ns a JOIN ns b ON a.source < b.source
    ),
    inter AS (
      SELECT x.source AS s1, y.source AS s2, CAST(COUNT(*) AS BIGINT) AS i
      FROM hs x JOIN hs y ON x.h = y.h AND x.source < y.source
      GROUP BY 1, 2
    ),
    u AS (
      SELECT p.s1, p.s2, bk.h, 1 AS side
      FROM pairs p JOIN bk ON bk.source = p.s1
      UNION ALL
      SELECT p.s1, p.s2, bk.h, 2 AS side
      FROM pairs p JOIN bk ON bk.source = p.s2
    ),
    g AS (
      SELECT s1, s2, h,
             CASE WHEN COUNT(*) = 2 THEN 1 ELSE 0 END AS in_both
      FROM u GROUP BY s1, s2, h
    ),
    merged AS (
      SELECT s1, s2, in_both,
             ROW_NUMBER() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
      FROM g
    ),
    est AS (
      SELECT s1, s2, CAST(SUM(in_both) AS BIGINT) AS kmv_matches
      FROM merged WHERE rn <= {_KMV_K} GROUP BY s1, s2
    )
    SELECT p.s1, p.s2, p.n1, p.n2,
           COALESCE(i.i, 0) AS inter_exact,
           p.n1 + p.n2 - COALESCE(i.i, 0) AS union_exact,
           round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / (p.n1 + p.n2 - COALESCE(i.i, 0)), 6) AS jac_exact,
           e.kmv_matches,
           round(CAST(e.kmv_matches AS DOUBLE) / {_KMV_K}, 6) AS jac_kmv
    FROM pairs p
    JOIN est e ON p.s1 = e.s1 AND p.s2 = e.s2
    LEFT JOIN inter i ON p.s1 = i.s1 AND p.s2 = i.s2
    ORDER BY p.s1, p.s2
    """,
    tags=("sketch", "kmv", "dedup", "similarity", "mergeable"),
)
def sketch_kmv_jaccard(spark, sf_dir):
    """KMV (bottom-k) sketch Jaccard between document sources: each
    source keeps its k=64 smallest md5 hashes of distinct texts; for a
    pair, merge the two sketches, keep the k smallest of the union, and
    count how many live in both — matches/k estimates J(A,B).  The
    sketch build is a rank<=k window that Spark rewrites to
    WindowGroupLimit (each map task forwards at most k rows per source
    BEFORE the shuffle), so sketching 100 TB moves k rows per source
    per task, never the corpus; the pair stage touches k x |sources|
    rows.  The exact inter/union/jac columns are the EVALUATION side
    (same role as true_cnt in the Count-Min row) — at scale you would
    keep only the sketch columns.  All hashes are 60-bit md5 prefixes:
    both engines derive identical sketches, so the estimate itself is
    oracle-checked bit-for-bit."""
    from pyspark.sql import Window

    # six downstream subtrees (bottom-k, per-source counts, the exact
    # intersection's two sides, the two merge branches) all read the
    # hashed distinct set.  It is |distinct(source, text)|-sized —
    # corpus-bounded but small after dedup — so materialize it ONCE
    # with an eager localCheckpoint: the md5 scan + distinct shuffle
    # run a single time and every consumer reads the checkpointed
    # rows.  (.persist() — the previous form — leaves an
    # InMemoryRelation that blocks AQE partition coalescing, the same
    # pathology measured 4-6x slower in stats_tests_queries, and was
    # never unpersisted, pinning executor memory for the rest of the
    # session.)  No coalesce: hs is corpus-bounded, so a fixed
    # partition cap would throttle the distinct reduce and every
    # consumer at scale — the post-shuffle (AQE-coalesced) layout is
    # already sized to the data.
    hs = (
        table(spark, sf_dir, "documents")
        .select("source", F.expr(_KMV_H_SPARK).alias("h"))
        .distinct()
        .localCheckpoint()
    )
    w = Window.partitionBy("source").orderBy("h")
    bk = (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("source", "h")
    )
    ns = hs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = ns.alias("a"), ns.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.source") < F.col("b.source")
    ).select(
        F.col("a.source").alias("s1"),
        F.col("b.source").alias("s2"),
        F.col("a.n").alias("n1"),
        F.col("b.n").alias("n2"),
    )
    x, y = hs.alias("x"), hs.alias("y")
    inter = (
        x.join(y, (F.col("x.h") == F.col("y.h")) & (F.col("x.source") < F.col("y.source")))
        .groupBy(F.col("x.source").alias("s1"), F.col("y.source").alias("s2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    p_slim = pairs.select("s1", "s2")
    u = (
        p_slim.join(bk, bk.source == F.col("s1"))
        .select("s1", "s2", "h", F.lit(1).alias("side"))
        .unionAll(
            p_slim.join(bk, bk.source == F.col("s2")).select(
                "s1", "s2", "h", F.lit(2).alias("side")
            )
        )
    )
    g = u.groupBy("s1", "s2", "h").agg(
        F.when(F.count(F.lit(1)) == 2, 1).otherwise(0).alias("in_both")
    )
    wm = Window.partitionBy("s1", "s2").orderBy("h")
    est = (
        g.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("s1", "s2")
        .agg(F.sum("in_both").cast("bigint").alias("kmv_matches"))
    )
    return (
        pairs.join(est, ["s1", "s2"])
        .join(inter, ["s1", "s2"], "left")
        .select(
            "s1",
            "s2",
            "n1",
            "n2",
            F.coalesce(F.col("i"), F.lit(0)).cast("bigint").alias("inter_exact"),
            (F.col("n1") + F.col("n2") - F.coalesce(F.col("i"), F.lit(0)))
            .cast("bigint")
            .alias("union_exact"),
            F.round(
                F.coalesce(F.col("i"), F.lit(0)).cast("double")
                / (F.col("n1") + F.col("n2") - F.coalesce(F.col("i"), F.lit(0))),
                6,
            ).alias("jac_exact"),
            "kmv_matches",
            F.round(F.col("kmv_matches").cast("double") / _KMV_K, 6).alias("jac_kmv"),
        )
        .orderBy("s1", "s2")
    )


# ------------------------------------------------- histogram quantiles

_HQ_W = 100_000  # bucket width in price cents ($1000)
_HQ_QS = [(50, 100), (90, 100), (99, 100)]


@register(
    "sketch_histogram_quantiles",
    bench=True,
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem
    ),
    hist AS (
      SELECT c // {_HQ_W} AS b, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1
    ),
    cum AS (
      SELECT b, cnt, SUM(cnt) OVER (ORDER BY b) AS cum_cnt FROM hist
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    qs AS (
      SELECT * FROM (VALUES {', '.join(f'({num}, {den})' for num, den in _HQ_QS)})
        t(num, den)
    ),
    targets AS (
      SELECT qs.num AS q_pct, (qs.num * n.n + qs.den - 1) // qs.den AS rank
      FROM qs, n
    ),
    est AS (
      SELECT t.q_pct, t.rank, MIN(c.b) AS est_b
      FROM targets t JOIN cum c ON c.cum_cnt >= t.rank
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM v
    )
    SELECT e.q_pct, e.rank AS target_rank,
           e.est_b * {_HQ_W} AS est_lo_cents,
           r.c AS exact_cents,
           r.c - e.est_b * {_HQ_W} AS err_cents
    FROM est e JOIN ranked r ON r.rn = e.rank
    ORDER BY e.q_pct
    """,
    tags=("sketch", "histogram", "quantile", "mergeable", "A3-scale"),
)
def sketch_histogram_quantiles(spark, sf_dir):
    """Mergeable fixed-width histogram quantiles (p50/p90/p99 of
    l_extendedprice in cents, $1000 buckets): the sketch is ONE
    map-side-combined aggregation into ~100 bucket counters — constant
    state at any corpus size, and two histograms merge by adding
    counters, so the build parallelizes without coordination (the same
    mergeability contract as Count-Min/HLL).  The quantile readout
    walks the cumulative counts to the first bucket covering rank
    ceil(q*N); its lower bound is the estimate, and the guaranteed
    bound err in [0, width) is emitted against the EXACT rank-selected
    percentile.  The exact pick itself leans on the histogram: only
    the target bucket's rows (~N/|buckets|) are sorted, rank within
    bucket = target - rows-before-bucket — so even the evaluation
    column avoids a global sort and survives 100 TB.  All arithmetic
    is integer (prices fixed-pointed to cents, ranks via ceiling
    division), so both engines agree bit-for-bit.  The cumulative
    counts over the histogram run as the two-pass distributed prefix
    sum (operators/prefix.py) — the bucket axis grows with the value
    domain, so even it never rides a SinglePartition window."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    v = table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("c")
    )
    hist = (
        v.select((F.col("c") / _HQ_W).cast("bigint").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # hist IS the sketch — |value-domain / width| rows (~100 here) — but
    # five downstream subtrees reference it (range bucketing, the
    # within-bucket cum window, the per-bucket carry totals, the corpus
    # count, the est probe), and with full lineage every reference
    # re-runs the lineitem aggregation that built it.  Eagerly
    # checkpoint the tiny sufficient statistic (the stats_tests
    # _with_cumulative discipline; .persist() measured 4-6x slower
    # there because InMemoryRelation blocks AQE coalescing) and derive
    # N = SUM(cnt) from the checkpointed counters instead of a second
    # corpus-sized count scan: the query pays exactly TWO lineitem
    # passes (sketch build + exact-pick probe), at any scale.
    hist = hist.coalesce(8).localCheckpoint()
    histb = with_range_bucket(hist, "b", 16)
    hist_carry = lower_bucket_agg(
        histb.groupBy("__bkt").agg(F.sum("cnt").alias("__btot")),
        "__bkt",
        "__btot",
        "__carry",
    )
    cum = (
        histb.join(F.broadcast(hist_carry), "__bkt")
        .withColumn(
            "cum_cnt",
            F.sum("cnt").over(Window.partitionBy("__bkt").orderBy("b"))
            + F.col("__carry"),
        )
        .drop("__bkt", "__carry")
    )
    # coalesce: SUM over an empty histogram is NULL where the previous
    # COUNT(*) over the corpus was 0 — keep the empty-input behavior
    n = hist.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n")
    )
    qs = spark.createDataFrame(_HQ_QS, "num long, den long")
    targets = qs.crossJoin(F.broadcast(n)).select(
        F.col("num").alias("q_pct"),
        F.expr("(num * n + den - 1) div den").alias("target_rank"),
    )
    est = (
        targets.join(
            F.broadcast(cum), F.col("cum_cnt") >= F.col("target_rank")
        )
        .groupBy("q_pct", "target_rank")
        .agg(
            F.min(F.struct("b", "cum_cnt")).alias("first_cover"),
        )
        .select(
            "q_pct",
            "target_rank",
            F.col("first_cover.b").alias("est_b"),
            (F.col("first_cover.cum_cnt")).alias("cum_at"),
        )
    )
    # exact rank selection WITHOUT a global sort: the histogram already
    # locates the target bucket, so only that bucket's rows (≈N/|hist|)
    # are sorted — rank within the bucket is target_rank minus the rows
    # before it (cum_at - rows_in_bucket).  The oracle keeps the
    # equivalent global ROW_NUMBER form; results are identical.
    in_bucket = v.join(
        F.broadcast(est),
        (F.col("c") / _HQ_W).cast("bigint") == F.col("est_b"),
    )
    w_local = Window.partitionBy("q_pct").orderBy("c")
    w_bucket = Window.partitionBy("q_pct")
    picked = (
        in_bucket.withColumn("rn", F.row_number().over(w_local))
        .withColumn("rows_in_bucket", F.count(F.lit(1)).over(w_bucket))
        .filter(
            F.col("rn")
            == F.col("target_rank") - (F.col("cum_at") - F.col("rows_in_bucket"))
        )
    )
    return (
        picked
        .select(
            "q_pct",
            "target_rank",
            (F.col("est_b") * _HQ_W).alias("est_lo_cents"),
            F.col("c").alias("exact_cents"),
            (F.col("c") - F.col("est_b") * _HQ_W).alias("err_cents"),
        )
        .orderBy("q_pct")
    )


# ------------------------------------------------- exact bitmap distinct

_BM_WORD = 32  # user-id bits per bigint word (sign-safe everywhere)


@register(
    "agg_bitmap_exact_distinct",
    oracle=f"""
    WITH words AS (
      SELECT event_type,
             user_id // {_BM_WORD} AS word,
             bit_or(CAST(1 AS BIGINT)
                    << CAST(user_id % {_BM_WORD} AS INT)) AS bits
      FROM events
      GROUP BY event_type, user_id // {_BM_WORD}
    )
    SELECT event_type,
           CAST(SUM(bit_count(bits)) AS BIGINT) AS n_distinct_users,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(MAX(word) + 1 AS BIGINT) AS id_space_words
    FROM words
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("sketch", "bitmap", "distinct", "A3-scale", "mergeable"),
)
def agg_bitmap_exact_distinct(spark, sf_dir):
    """EXACT distinct counting through mergeable integer bitmaps (the
    roaring-bitmap layout ClickHouse/Druid use for high-cardinality
    COUNT DISTINCT): each (group, id div 32) cell folds member ids
    into one bigint word with bit_or — a partial that merges by OR, so
    map-side combine does most of the work and the shuffle carries at
    most |id-space|/32 words per group, NOT one row per distinct
    member the way count(distinct) shuffles.  popcount over the words
    is the exact answer.  Between HLL (approximate, constant state)
    and count(distinct) (exact, member-sized shuffle) this is the
    third point on the curve: exact AND bounded by the id space — the
    right tool for dense surrogate-key domains.  Every op is integer
    (shift, or, popcount): bit-identical in the oracle."""
    ev = table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr(f"user_id div {_BM_WORD}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BM_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("event_type", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return (
        words.groupBy("event_type")
        .agg(
            F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct_users"),
            F.count(F.lit(1)).alias("n_words"),
            (F.max("word") + 1).cast("bigint").alias("id_space_words"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------- weighted histogram quantiles


@register(
    "sketch_weighted_quantiles",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS wt
      FROM lineitem
    ),
    hist AS (
      SELECT c // {_HQ_W} AS b, CAST(SUM(wt) AS BIGINT) AS w
      FROM v GROUP BY 1
    ),
    cum AS (SELECT b, w, SUM(w) OVER (ORDER BY b) AS cum_w FROM hist),
    n AS (SELECT CAST(SUM(wt) AS BIGINT) AS wt_total FROM v),
    qs AS (
      SELECT * FROM (VALUES {', '.join(f'({num}, {den})' for num, den in _HQ_QS)})
        t(num, den)
    ),
    targets AS (
      SELECT qs.num AS q_pct,
             (qs.num * n.wt_total + qs.den - 1) // qs.den AS target_w
      FROM qs, n
    ),
    est AS (
      SELECT t.q_pct, t.target_w,
             MIN(c.b) AS est_b,
             MIN_BY(c.cum_w, c.b) AS cum_at
      FROM targets t JOIN cum c ON c.cum_w >= t.target_w
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT e.q_pct, e.target_w, e.est_b, v.c, v.wt,
             SUM(v.wt) OVER (PARTITION BY e.q_pct ORDER BY v.c, v.wt
                             ROWS UNBOUNDED PRECEDING) AS run_w,
             e.cum_at - SUM(v.wt) OVER (PARTITION BY e.q_pct) AS w_before
      FROM est e JOIN v ON v.c // {_HQ_W} = e.est_b
    )
    SELECT q_pct, target_w,
           est_b * {_HQ_W} AS est_lo_cents,
           MIN(c) AS exact_cents
    FROM ranked
    WHERE run_w >= target_w - w_before
    GROUP BY q_pct, target_w, est_b
    ORDER BY q_pct
    """,
    tags=("sketch", "histogram", "quantile", "weighted", "mergeable"),
)
def sketch_weighted_quantiles(spark, sf_dir):
    """WEIGHTED quantiles (price percentiles by shipped quantity — the
    'p50 of spend' class of metric where each row counts as its
    weight, not as 1): the same mergeable fixed-width histogram as
    sketch_histogram_quantiles, but bucket counters accumulate integer
    weights, and the rank becomes a target cumulative weight
    ceil(q*W_total).  The exact evaluation pick again narrows to the
    target bucket — only its rows sort, by (value, weight) with a
    running-weight filter — so the weighted-exact column also avoids
    any global sort.  All integer: weights are unit quantities, prices
    cents, targets ceiling-division rationals; both engines agree
    bit-for-bit.  The cumulative weights over the histogram run as the
    two-pass distributed prefix sum (operators/prefix.py) — no
    SinglePartition window even on the bucket axis."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    v = table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("c"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("wt"),
    )
    hist = (
        v.select((F.col("c") / _HQ_W).cast("bigint").alias("b"), "wt")
        .groupBy("b")
        .agg(F.sum("wt").alias("w"))
    )
    histb = with_range_bucket(hist, "b", 16)
    hist_carry = lower_bucket_agg(
        histb.groupBy("__bkt").agg(F.sum("w").alias("__btot")),
        "__bkt",
        "__btot",
        "__carry",
    )
    cum = (
        histb.join(F.broadcast(hist_carry), "__bkt")
        .withColumn(
            "cum_w",
            F.sum("w").over(Window.partitionBy("__bkt").orderBy("b"))
            + F.col("__carry"),
        )
        .drop("__bkt", "__carry")
    )
    n = v.agg(F.sum("wt").alias("wt_total"))
    qs = spark.createDataFrame(_HQ_QS, "num long, den long")
    targets = qs.crossJoin(F.broadcast(n)).select(
        F.col("num").alias("q_pct"),
        F.expr("(num * wt_total + den - 1) div den").alias("target_w"),
    )
    est = (
        targets.join(F.broadcast(cum), F.col("cum_w") >= F.col("target_w"))
        .groupBy("q_pct", "target_w")
        .agg(F.min(F.struct("b", "cum_w")).alias("fc"))
        .select(
            "q_pct",
            "target_w",
            F.col("fc.b").alias("est_b"),
            F.col("fc.cum_w").alias("cum_at"),
        )
    )
    in_bucket = v.join(
        F.broadcast(est), (F.col("c") / _HQ_W).cast("bigint") == F.col("est_b")
    )
    w_run = (
        Window.partitionBy("q_pct")
        .orderBy("c", "wt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bucket = Window.partitionBy("q_pct")
    picked = (
        in_bucket.withColumn("run_w", F.sum("wt").over(w_run))
        .withColumn(
            "w_before", F.col("cum_at") - F.sum("wt").over(w_bucket)
        )
        .filter(F.col("run_w") >= F.col("target_w") - F.col("w_before"))
    )
    return (
        picked.groupBy("q_pct", "target_w", "est_b")
        .agg(F.min("c").alias("exact_cents"))
        .select(
            "q_pct",
            "target_w",
            (F.col("est_b") * _HQ_W).alias("est_lo_cents"),
            "exact_cents",
        )
        .orderBy("q_pct")
    )


# ------------------------------------------- equi-depth histogram / CBO

_ED_K = 8  # equi-depth buckets
_ED_LO = 50_000_00  # probe predicate [lo, hi] in price cents
_ED_HI = 150_000_00


@register(
    "stats_equi_depth_estimate",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    ranked AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM v),
    bounds AS (
      -- boundary j = value at rank ceil(j*N/k), j = 1..k
      SELECT j.j, r.c AS ub
      FROM range(1, {_ED_K} + 1) j(j), n
      JOIN ranked r ON r.rn = (j.j * n.n + {_ED_K} - 1) // {_ED_K}
    ),
    -- uniform-within-bucket interpolation of the probe range:
    -- full buckets inside [lo,hi] count N/k each; partial buckets
    -- contribute proportionally by value overlap (integer math)
    spans AS (
      SELECT b.j, b.ub,
             COALESCE(LAG(b.ub) OVER (ORDER BY b.j),
                      (SELECT MIN(c) - 1 FROM v)) AS lb
      FROM bounds b
    ),
    est AS (
      SELECT CAST(SUM(
               CASE WHEN lb >= {_ED_HI} OR ub < {_ED_LO} THEN 0
                    ELSE (n.n // {_ED_K})
                         * (LEAST(ub, {_ED_HI}) - GREATEST(lb, {_ED_LO} - 1))
                         // (ub - lb) END) AS BIGINT) AS est_rows
      FROM spans, n
    ),
    act AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
      FROM v WHERE c BETWEEN {_ED_LO} AND {_ED_HI}
    )
    SELECT n.n AS n_rows, e.est_rows, a.actual_rows,
           abs(e.est_rows - a.actual_rows) AS abs_err,
           round(CAST(e.est_rows AS DOUBLE) / a.actual_rows, 4) AS q_error
    FROM est e, act a, n
    """,
    tags=("stats", "equi-depth", "cbo", "cardinality"),
)
def stats_equi_depth_estimate(spark, sf_dir):
    """Equi-depth histogram statistics + cardinality-estimation
    quality — what ANALYZE TABLE builds and what the cost-based
    optimizer consumes: 8 boundaries at exact ranks ceil(j*N/k), then
    a range predicate's row count ESTIMATED by uniform-within-bucket
    interpolation (full buckets count N/k, partial buckets pro-rata by
    value overlap — integer division throughout) and compared against
    the ACTUAL count.  The emitted q_error is the metric CBO papers
    grade estimators on.  Ranks come from the two-pass distributed
    rank (operators/prefix.py): value range-bucket → within-bucket
    row_number + broadcast lower-bucket counts — no SinglePartition
    window over the |orders|-sized value table; the k-row boundary
    table finds its neighbor by a j-1 self-join instead of a lag
    window.  The estimate itself touches only the boundary table —
    which is the point: the optimizer answers from stats, never from
    data."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        lower_bucket_agg,
        with_range_bucket,
    )

    v = table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("c")
    )
    n_row = v.agg(
        F.count(F.lit(1)).alias("n"), (F.min("c") - 1).alias("minc")
    )
    vb = with_range_bucket(v, "c", 64)
    offs = lower_bucket_agg(
        vb.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt")),
        "__bkt",
        "__cnt",
        "__off",
    )
    ranked = vb.join(F.broadcast(offs), "__bkt").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("__bkt").orderBy("c"))
        + F.col("__off"),
    )
    js = spark.createDataFrame([(j,) for j in range(1, _ED_K + 1)], "j long")
    bounds = (
        js.crossJoin(F.broadcast(n_row))
        .join(
            ranked,
            F.col("rn") == F.expr(f"(j * n + {_ED_K} - 1) div {_ED_K}"),
        )
        .select("j", F.col("c").alias("ub"), "n", "minc")
    )
    prev = bounds.select(
        (F.col("j") + 1).alias("__j2"), F.col("ub").alias("__prev_ub")
    )
    spans = bounds.join(
        F.broadcast(prev), F.col("j") == F.col("__j2"), "left"
    ).withColumn("lb", F.coalesce(F.col("__prev_ub"), F.col("minc")))
    est = spans.agg(
        F.sum(
            F.when(
                (F.col("lb") >= _ED_HI) | (F.col("ub") < _ED_LO), F.lit(0)
            ).otherwise(
                F.expr(
                    f"(n div {_ED_K}) * (LEAST(ub, {_ED_HI}) - "
                    f"GREATEST(lb, {_ED_LO} - 1)) div (ub - lb)"
                )
            )
        )
        .cast("bigint")
        .alias("est_rows")
    )
    act = v.filter(F.col("c").between(_ED_LO, _ED_HI)).agg(
        F.count(F.lit(1)).alias("actual_rows")
    )
    return (
        n_row.select("n")
        .crossJoin(est)
        .crossJoin(act)
        .select(
            F.col("n").alias("n_rows"),
            "est_rows",
            "actual_rows",
            F.abs(F.col("est_rows") - F.col("actual_rows")).alias("abs_err"),
            F.round(
                F.col("est_rows").cast("double") / F.col("actual_rows"), 4
            ).alias("q_error"),
        )
    )


@register(
    "sketch_theta_set_ops",
    oracle="""
    WITH f AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderstatus = 'F'),
    p AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderstatus = 'P')
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM f) AS n_f,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_p,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM f JOIN p USING (o_custkey)) AS n_intersect,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT o_custkey FROM f UNION
                  SELECT o_custkey FROM p)) AS n_union,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM f
            WHERE o_custkey NOT IN (SELECT o_custkey FROM p))
             AS n_f_only
    """,
    tags=("sketch", "theta", "set-ops", "A3-scale"),
)
def sketch_theta_set_ops(spark, sf_dir):
    """Theta sketches (Apache DataSketches, Spark 4): the sketch
    family that supports full SET ALGEBRA — intersection and
    difference estimates, which HLL structurally cannot do (it only
    unions).  The audience-overlap question every analytics stack
    asks ('customers with both an F and a P order') is answered from
    two per-segment sketches WITHOUT a distinct-join: sketches build
    map-side in one pass each, ship as bytes, and intersect/diff/union
    in O(k).  lgNomEntries=16 keeps the sketches in exact mode through
    sf0.1's 15k customers (a theta sketch is exact until it exceeds
    its nominal 2^lgK entries; at true 100 TB cardinalities the same
    query emits accuracy-bound flags like the approx_distinct family —
    the oracle states exact relational set algebra either way)."""
    o = table(spark, sf_dir, "orders")
    sk = o.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'F' "
            "THEN o_custkey END, 16)"
        ).alias("sk_f"),
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'P' "
            "THEN o_custkey END, 16)"
        ).alias("sk_p"),
    )
    return sk.select(
        F.expr("theta_sketch_estimate(sk_f)").cast("bigint").alias("n_f"),
        F.expr("theta_sketch_estimate(sk_p)").cast("bigint").alias("n_p"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_f, sk_p))")
        .cast("bigint")
        .alias("n_intersect"),
        # theta_union takes its OWN nominal-entries budget (default
        # lgK=12 = 4096): the union of two exact 15k-entry sketches
        # would DOWNSAMPLE and go approximate — size it like the inputs
        F.expr("theta_sketch_estimate(theta_union(sk_f, sk_p, 16))")
        .cast("bigint")
        .alias("n_union"),
        F.expr("theta_sketch_estimate(theta_difference(sk_f, sk_p))")
        .cast("bigint")
        .alias("n_f_only"),
    )


@register(
    "sketch_approx_top_k",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus AS item, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_orderstatus
    ),
    ranked AS (
      SELECT item, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, item ASC) AS rnk
      FROM counts
    )
    SELECT string_agg(item || ':' || CAST(cnt AS VARCHAR), ','
                      ORDER BY rnk) AS top2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM counts) AS n_items
    FROM ranked WHERE rnk <= 2
    """,
    tags=("sketch", "heavy-hitters", "approx-top-k", "A3-scale"),
)
def sketch_approx_top_k(spark, sf_dir):
    """``approx_top_k`` (Spark 4.1's built-in heavy-hitters sketch —
    the engine-native successor to the hand-rolled Count-Min in
    sketch_countmin_heavy_hitters): single pass, mergeable partials,
    bounded memory.  Below maxItemsTracked the sketch is EXACT, so the
    top-2 order statuses hash-match the oracle's exact ranked counts
    (the status counts are pairwise distinct at every SF, making the
    ranking unambiguous; the array<struct> result is serialized to
    'item:count' per the driver-canonicalizer fence).  At true 100 TB
    item cardinality the same plan degrades gracefully to approximate
    counts with the same shape."""
    o = table(spark, sf_dir, "orders")
    top = o.agg(
        F.expr("approx_top_k(o_orderstatus, 2)").alias("tk"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("n_items"),
    )
    return top.select(
        F.array_join(
            F.transform(
                F.col("tk"),
                lambda e: F.concat(
                    e["item"], F.lit(":"), e["count"].cast("string")
                ),
            ),
            ",",
        ).alias("top2"),
        "n_items",
    )


@register(
    "sketch_topk_mergeable_rollup",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus AS item, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_orderstatus
    ),
    ranked AS (
      SELECT item, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, item ASC) AS rnk
      FROM counts
    )
    SELECT (SELECT string_agg(item || ':' || CAST(cnt AS VARCHAR), ','
                              ORDER BY rnk)
            FROM ranked WHERE rnk <= 2) AS top2_alltime,
           (SELECT CAST(COUNT(DISTINCT year(o_orderdate)) AS BIGINT)
            FROM orders) AS n_year_partials
    """,
    tags=("sketch", "heavy-hitters", "mergeable", "A3-scale"),
)
def sketch_topk_mergeable_rollup(spark, sf_dir):
    """The MERGEABLE form of the heavy-hitters sketch — the shape that
    actually matters at 100 TB: ``approx_top_k_accumulate`` builds one
    bounded-memory partial PER YEAR PARTITION (in production these
    land in a stats table as bytes, computed incrementally as data
    arrives), and any rollup — here all-time — is
    ``approx_top_k_combine`` over the partials + one ``_estimate``,
    WITHOUT re-touching the fact table.  Same contract as the HLL
    mergeable rollup (agg_hll_mergeable_rollup), now for frequency
    estimation.  Below maxItemsTracked the partials are exact, so the
    combined top-2 hash-matches the oracle's exact ranked recount;
    ties cannot occur (status counts are pairwise distinct at every
    SF)."""
    o = table(spark, sf_dir, "orders")
    per_year = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.expr("approx_top_k_accumulate(o_orderstatus)").alias("st")
    )
    rolled = per_year.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(st), 2)").alias(
            "tk"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_year_partials"),
    )
    return rolled.select(
        F.array_join(
            F.transform(
                F.col("tk"),
                lambda e: F.concat(
                    e["item"], F.lit(":"), e["count"].cast("string")
                ),
            ),
            ",",
        ).alias("top2_alltime"),
        "n_year_partials",
    )

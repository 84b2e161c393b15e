"""Entity-resolution / governance declared queries (round 2 wave 7).

Record linkage is the step between CDC ingestion and a trustworthy
dimension table: the same real-world entity arrives spelled
differently from different sources.  Both classic blocking families
are implemented, plus the GDPR right-to-be-forgotten propagation the
reference's delete pipeline (delete_table.py) implies but never
composes across tables:

- ``er_blocked_fuzzy_match`` — standard blocking: a deterministic
  "dirty" replica of the customer dimension is matched back against
  the clean table inside coarse blocks, scored by Levenshtein edit
  distance, resolved to the best match per dirty record.
- ``er_sorted_neighborhood`` — Sorted Neighborhood Method: clean and
  dirty records unioned, sorted by name, and compared only against
  the next w neighbors in sort order (no pairwise explosion at all).
- ``gdpr_delete_propagation`` — one deletion-request set propagated
  through the full relational cascade (customer -> orders ->
  lineitem, plus the events stream), reporting purged/retained
  counts per table.

Scale notes (100 TB): blocking keys bound the candidate set — the
fuzzy join shuffles on (block) and compares only within-block pairs.
Block cardinality is SCALE-ADAPTIVE: both queries block on the last
``k`` digits of the name where ``k = digits(floor((n-1)/64))``
(clamped to [2, 6]), so block count grows 10x for every 10x of data
and the EXPECTED BLOCK SIZE IS CONSTANT (~6.4-64 rows per side).
Per-block work is |block|^2 Levenshteins => total work O(N * const),
not O(N^2 / const).  A hard guard (``_ER_MAX_BLOCK``) drops any
pathological block outright — same policy as the shingle-frequency
caps in llm/dedup — and a free length-band prefilter
(|len(a)-len(b)| <= 2, implied by edit distance <= 2) prunes pairs
before any Levenshtein is computed; the Spark side additionally
bounds each Levenshtein with the threshold argument (O(len*t) with
early exit, -1 for "above threshold").
Sorted-neighborhood partitions its window by the same adaptive tail
block, so each partition sorts ~constant rows locally (w-1 candidate
pairs are lost at each block boundary — the standard multi-pass SNM
answer is a second pass on a shifted key, which is just this query
with another tail length).  GDPR propagation is two broadcast
semi-joins and one key-hash semi-join (orders->lineitem), each a
single pass.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.hints import runtime_sized
from lakehouse_cdc_spark.plans.registry import register, table

# Deterministic corruption of c_name, identical SQL on both engines:
#   key % 3 == 0 -> digit at position 10 overwritten with 'X' (1 edit)
#   key % 3 == 1 -> character at position 12 deleted        (1 edit)
#   key % 3 == 2 -> unchanged                               (0 edits)
_DIRTY_SQL = """
      CASE WHEN c_custkey % 3 = 0
             THEN substr(c_name, 1, 9) || 'X' || substr(c_name, 11)
           WHEN c_custkey % 3 = 1
             THEN substr(c_name, 1, 11) || substr(c_name, 13)
           ELSE c_name END
"""


def _dirty_name():
    return (
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.substring("c_name", 1, 9), F.lit("X"), F.expr("substr(c_name, 11)")
            ),
        )
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(F.substring("c_name", 1, 11), F.expr("substr(c_name, 13)")),
        )
        .otherwise(F.col("c_name"))
    )


# Scale-adaptive blocking: k trailing name digits, where k grows with
# the table so expected block size stays ~_ER_BLOCK_TARGET per side.
# Clamped to [2, 6]: both deterministic corruptions only touch name
# positions <= 12, so the last 6 characters are always preserved and
# a true match can never cross blocks.
_ER_BLOCK_TARGET = 64
_ER_MAX_BLOCK = 10_000  # hard guard: drop pathological blocks outright


def _tail_digits(n_rows: int, target: int = _ER_BLOCK_TARGET) -> int:
    """k = number of digits of floor((n-1)/target), clamped to [2,6].
    Each extra digit multiplies block count by 10, so expected block
    size stays in [target/10, target] as the table grows."""
    return min(6, max(2, len(str(max(0, n_rows - 1) // target))))


#: customer row counts per sf_dir — the blocking-key width is a
#: PLANNING-time decision, so the count job runs once per dataset, not
#: once per query invocation (five ER queries each re-counted before)
_ROWCOUNT_CACHE: dict[str, int] = {}


def _customer_count(spark, sf_dir: str) -> int:
    n = _ROWCOUNT_CACHE.get(sf_dir)
    if n is None:
        n = table(spark, sf_dir, "customer").count()
        _ROWCOUNT_CACHE[sf_dir] = n
    return n


# The identical formula in SQL, for the DuckDB oracle (n = the CTE's
# COUNT(*) expression passed in).
def _tail_digits_sql(n_expr: str, target: int = _ER_BLOCK_TARGET) -> str:
    return (
        f"LEAST(6, GREATEST(2, LENGTH(CAST(({n_expr} - 1) // {target} AS VARCHAR))))"
    )


#: shared match CTE chain — er_blocked_fuzzy_match emits `matches`
#: directly; er_golden_record consumes it for survivorship
_ER_MATCH_CTES = f"""
    WITH params AS (
      SELECT {_tail_digits_sql('COUNT(*)')} AS k FROM customer
    ),
    dirty AS (
      SELECT c_custkey AS dirty_key, {_DIRTY_SQL} AS dirty_name,
             right({_DIRTY_SQL}, (SELECT k FROM params)) AS blk
      FROM customer
    ),
    clean AS (SELECT c_custkey AS clean_key, c_name,
                     right(c_name, (SELECT k FROM params)) AS blk
              FROM customer),
    big AS (SELECT blk FROM clean GROUP BY blk HAVING COUNT(*) > {_ER_MAX_BLOCK}),
    scored AS (
      SELECT d.dirty_key, c.clean_key,
             CAST(levenshtein(d.dirty_name, c.c_name) AS INT) AS lev,
             ROW_NUMBER() OVER (PARTITION BY d.dirty_key
                                ORDER BY levenshtein(d.dirty_name, c.c_name),
                                         c.clean_key) AS rn
      FROM dirty d JOIN clean c USING (blk)
      WHERE d.blk NOT IN (SELECT blk FROM big)
        AND abs(length(d.dirty_name) - length(c.c_name)) <= 2
    )
    ,
    matches AS (
      SELECT dirty_key, clean_key AS matched_key, lev,
             CAST(CASE WHEN dirty_key = clean_key THEN 1 ELSE 0 END AS INT)
               AS is_correct
      FROM scored
      WHERE rn = 1 AND lev <= 2
    )
"""


@register(
    "er_blocked_fuzzy_match",
    bench=True,
    oracle=_ER_MATCH_CTES
    + """
    SELECT dirty_key, matched_key, lev, is_correct FROM matches
    """,
    tags=("er", "fuzzy", "levenshtein", "J3"),
)
def er_blocked_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy self-linkage: a deterministically corrupted
    replica of customer (<=1 edit per name) is matched back against
    the clean dimension, scored with Levenshtein, and resolved to the
    single best match per dirty record (min distance, min key
    tie-break, distance <= 2 accepted).

    Scale shape: candidates are generated only within a blocking key
    — the last k name digits, k scale-adaptive (``_tail_digits``) so
    block count grows with N and expected block size is CONSTANT;
    total work is O(N*const), not quadratic.  Blocks above
    ``_ER_MAX_BLOCK`` are dropped by a broadcast anti-join guard
    (mirrored in the oracle; never binds on well-distributed keys).
    A length-band prefilter (|len diff| <= 2) runs before any edit
    distance — it cannot drop a true lev<=2 candidate because edit
    distance >= length difference — and each surviving pair uses the
    threshold-bounded levenshtein(a, b, 2) (O(len*2) with early exit,
    -1 for "above 2", ranked as 999 so the true-distance winner is
    identical to the oracle's unbounded ordering).

    Driver-side ``count()`` to pick k is one O(1)-result metadata
    aggregate, same class as the documented centroid-fit probes."""
    return _fuzzy_matches(spark, sf_dir)


def _fuzzy_matches(spark, sf_dir, base=None):
    """The shared match stage (see er_blocked_fuzzy_match): one row per
    accepted (dirty_key, matched_key, lev, is_correct) link.

    ``base``: optional pre-materialized customer projection containing
    at least (c_custkey, c_name) — er_golden_record passes its own
    wider block so the whole query reads the dimension exactly once."""
    k = _tail_digits(_customer_count(spark, sf_dir))
    # One narrow (key, name) projection, materialized eagerly per
    # invocation: the dirty derivation, the clean join side and the
    # big-block census each referenced the dimension separately (4
    # parquet scans per consumer query); all three now read this one
    # block.  localCheckpoint, not persist — per-invocation lineage,
    # no CacheManager substitution across bench passes.  Natural
    # partitioning kept (|customer|-sized at scale).
    if base is None:
        base = (
            table(spark, sf_dir, "customer")
            .select("c_custkey", "c_name")
            .localCheckpoint()
        )
    dirty = base.select(
        F.col("c_custkey").alias("dirty_key"),
        _dirty_name().alias("dirty_name"),
    ).withColumn("blk", F.expr(f"right(dirty_name, {k})"))
    clean = base.select(
        F.col("c_custkey").alias("clean_key"),
        "c_name",
        F.expr(f"right(c_name, {k})").alias("blk"),
    )
    big = (
        clean.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > _ER_MAX_BLOCK)
        .select("blk")
    )
    scored = (
        dirty.join(runtime_sized(big, "membership"), "blk", "left_anti")
        .join(
            clean.join(runtime_sized(big, "membership"), "blk", "left_anti"),
            "blk",
        )
        .filter(F.abs(F.length("dirty_name") - F.length("c_name")) <= 2)
        .select(
            "dirty_key",
            "clean_key",
            F.levenshtein("dirty_name", "c_name", 2).cast("int").alias("lev"),
        )
    )
    # Best-match resolution as an ALGEBRAIC argmin (min_by over the
    # same (bounded-lev, clean_key) total order the oracle's
    # ROW_NUMBER expresses) instead of a rank-1 window pick: the
    # window form shuffled EVERY candidate pair to sort it inside its
    # dirty_key partition; min_by folds map-side, so only one partial
    # per dirty key crosses the exchange (~expected-block-size x fewer
    # shuffled rows at any scale).  Row-for-row equal to the window
    # form at sf0.1 (15 000 matches, verified; local wall parity —
    # the win is shuffle volume, not orchestration).
    order = F.struct(
        F.when(F.col("lev") < 0, 999).otherwise(F.col("lev")).alias("o1"),
        F.col("clean_key").alias("o2"),
    )
    return (
        scored.groupBy("dirty_key")
        .agg(F.min_by(F.struct("clean_key", "lev"), order).alias("p"))
        .select(
            "dirty_key",
            F.col("p.clean_key").alias("matched_key"),
            F.col("p.lev").alias("lev"),
        )
        .filter(F.col("lev").between(0, 2))
        .select(
            "dirty_key",
            "matched_key",
            "lev",
            F.when(F.col("dirty_key") == F.col("matched_key"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_correct"),
        )
    )


@register(
    "er_sorted_neighborhood",
    oracle=f"""
    WITH params AS (
      SELECT {_tail_digits_sql('2 * COUNT(*)')} AS k FROM customer
    ),
    recs AS (
      SELECT c_custkey AS key, c_name AS name, 'clean' AS src FROM customer
      UNION ALL
      SELECT c_custkey, {_DIRTY_SQL}, 'dirty' FROM customer
    ),
    nbr AS (
      SELECT key, name, src,
             LEAD(key, 1)  OVER w AS k1, LEAD(name, 1) OVER w AS n1,
             LEAD(src, 1)  OVER w AS s1,
             LEAD(key, 2)  OVER w AS k2, LEAD(name, 2) OVER w AS n2,
             LEAD(src, 2)  OVER w AS s2
      FROM recs
      WINDOW w AS (PARTITION BY right(name, (SELECT k FROM params))
                   ORDER BY name, src, key)
    )
    SELECT a_key, a_src, b_key, b_src, lev FROM (
      SELECT key AS a_key, src AS a_src, k1 AS b_key, s1 AS b_src,
             CAST(levenshtein(name, n1) AS INT) AS lev FROM nbr WHERE n1 IS NOT NULL
      UNION ALL
      SELECT key, src, k2, s2, CAST(levenshtein(name, n2) AS INT)
      FROM nbr WHERE n2 IS NOT NULL
    )
    WHERE lev BETWEEN 1 AND 2
    """,
    tags=("er", "fuzzy", "window", "W1"),
)
def er_sorted_neighborhood(spark, sf_dir):
    """Sorted Neighborhood Method: clean + dirty records are unioned,
    sorted by name WITHIN a tail-digit block, and each record is
    compared only to its next 2 neighbors in sort order — candidate
    generation is O(N*w) with zero joins (one window sort).  Pairs at
    distance 1..2 surface the linkage candidates; identical strings
    (lev 0) are exact dups handled by dedup_exact.

    The block key is the same scale-adaptive last-k-digits used by
    ``er_blocked_fuzzy_match`` (k from ``_tail_digits`` over the
    unioned row count), so block count grows with N and each window
    partition sorts a ~constant number of rows — no single-task
    global sort, no straggler partition (the classic SNM boundary
    loss — w-1 pairs per block edge — is recovered by a second pass
    on a shifted key, not by a global sort).  Both corruptions
    preserve the last 6 name characters, so a dirty record always
    co-blocks with its clean twin."""
    c = table(spark, sf_dir, "customer")
    k = _tail_digits(2 * _customer_count(spark, sf_dir))
    recs = c.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.lit("clean").alias("src"),
    ).unionAll(
        c.select(
            F.col("c_custkey").alias("key"),
            _dirty_name().alias("name"),
            F.lit("dirty").alias("src"),
        )
    )
    w = Window.partitionBy(F.expr(f"right(name, {k})")).orderBy("name", "src", "key")
    nbr = recs.select(
        "key",
        "name",
        "src",
        F.lead("key", 1).over(w).alias("k1"),
        F.lead("name", 1).over(w).alias("n1"),
        F.lead("src", 1).over(w).alias("s1"),
        F.lead("key", 2).over(w).alias("k2"),
        F.lead("name", 2).over(w).alias("n2"),
        F.lead("src", 2).over(w).alias("s2"),
    )
    pair1 = nbr.filter(F.col("n1").isNotNull()).select(
        F.col("key").alias("a_key"),
        F.col("src").alias("a_src"),
        F.col("k1").alias("b_key"),
        F.col("s1").alias("b_src"),
        F.levenshtein("name", "n1").cast("int").alias("lev"),
    )
    pair2 = nbr.filter(F.col("n2").isNotNull()).select(
        F.col("key").alias("a_key"),
        F.col("src").alias("a_src"),
        F.col("k2").alias("b_key"),
        F.col("s2").alias("b_src"),
        F.levenshtein("name", "n2").cast("int").alias("lev"),
    )
    return pair1.unionAll(pair2).filter(F.col("lev").between(1, 2))


@register(
    "gdpr_delete_propagation",
    oracle="""
    WITH req AS (
      SELECT c_custkey FROM customer
      WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0'
    ),
    o AS (SELECT o_orderkey, o_custkey FROM orders),
    purged_orders AS (SELECT o_orderkey FROM o
                      WHERE o_custkey IN (SELECT c_custkey FROM req))
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM req) AS purged_rows,
           (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM req) AS retained_rows
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM purged_orders),
           (SELECT COUNT(*) FROM o) - (SELECT COUNT(*) FROM purged_orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM purged_orders)),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM purged_orders))
    UNION ALL
    SELECT 'events',
           (SELECT COUNT(*) FROM events
            WHERE user_id IN (SELECT c_custkey FROM req)),
           (SELECT COUNT(*) FROM events
            WHERE user_id NOT IN (SELECT c_custkey FROM req))
    """,
    tags=("er", "gdpr", "J3", "governance"),
)
def gdpr_delete_propagation(spark, sf_dir):
    """Right-to-be-forgotten cascade: a deterministic deletion-request
    set (content-hash selection, ~1/16 of customers) is propagated
    through the foreign-key graph — customer -> orders -> lineitem,
    plus the events stream keyed by user — and the purge is reported
    per table as (purged, retained).  The request set and the purged
    order-key set are both tiny, so every membership probe is a
    BROADCAST semi/anti join against the fact tables: one scan per
    table, no fact-side shuffle anywhere (the reference's
    delete_table.py does one table per run; this composes the cascade
    in a single plan)."""
    req = (
        table(spark, sf_dir, "customer")
        .filter(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) == "0")
        .select(F.col("c_custkey").alias("__req_key"))
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e = table(spark, sf_dir, "events")

    purged_orders = o.join(
        F.broadcast(req), o.o_custkey == F.col("__req_key"), "left_semi"
    ).select(F.col("o_orderkey").alias("__req_key"))

    def counts(name, df, key, req_df):
        purged = df.join(
            F.broadcast(req_df), F.col(key) == F.col("__req_key"), "left_semi"
        ).agg(F.count(F.lit(1)).alias("purged_rows"))
        total = df.agg(F.count(F.lit(1)).alias("total"))
        return purged.crossJoin(total).select(
            F.lit(name).alias("table_name"),
            "purged_rows",
            (F.col("total") - F.col("purged_rows")).alias("retained_rows"),
        )

    return (
        counts("customer", c, "c_custkey", req)
        .unionAll(counts("orders", o, "o_custkey", req))
        .unionAll(counts("lineitem", li, "l_orderkey", purged_orders))
        .unionAll(counts("events", e, "user_id", req))
    )


@register(
    "er_golden_record",
    bench=True,
    oracle=_ER_MATCH_CTES
    + """
    ,
    members AS (
      -- surviving clean record of every matched entity
      SELECT m.matched_key AS entity, c.c_name AS name,
             CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM (SELECT DISTINCT matched_key FROM matches) m
      JOIN customer c ON c.c_custkey = m.matched_key
      UNION ALL
      -- its dirty replicas: corrupted name, dollar-truncated balance
      SELECT m.matched_key AS entity, d.dirty_name AS name,
             CAST(floor(c.c_acctbal) AS BIGINT) * 100 AS bal_cents
      FROM matches m
      JOIN dirty d ON d.dirty_key = m.dirty_key
      JOIN customer c ON c.c_custkey = m.dirty_key
    ),
    ranked AS (
      SELECT entity, name, bal_cents,
             ROW_NUMBER() OVER (PARTITION BY entity
                                ORDER BY length(name) DESC, name ASC) AS rn
      FROM members
    )
    SELECT r.entity,
           MAX(CASE WHEN r.rn = 1 THEN r.name END) AS golden_name,
           MAX(r.bal_cents) AS golden_bal_cents,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(DISTINCT r.name) AS BIGINT) AS n_name_variants
    FROM ranked r
    GROUP BY r.entity
    ORDER BY r.entity
    """,
    tags=("er", "survivorship", "golden-record", "mdm"),
)
def er_golden_record(spark, sf_dir):
    """Survivorship — the step AFTER record linkage that MDM pipelines
    run: collapse each matched entity's records (the clean row + its
    accepted dirty replicas) into one golden record by per-attribute
    rules.  Name survives by longest-then-lexicographic (damaged names
    are shorter or tie-break higher, so the undamaged spelling wins
    without ever consulting provenance); balance survives by MAX over
    fixed-point cents (the dirty source dollar-truncates, so max
    recovers the precise value); variant counts expose the conflict
    surface per entity.  All rules are total orders over exact
    integers/strings — engine-identical.  Scale shape: the match stage
    is the blocked O(N*const) join; survivorship itself is ONE
    entity-keyed shuffle with windows over member groups whose size
    the match acceptance bounds (<= 1 + replicas per entity)."""
    # ONE dimension read for the whole query: the match stage's three
    # consumers AND the two member branches below all derive from this
    # materialized (key, name, balance) projection.
    base = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .localCheckpoint()
    )
    # matches feeds BOTH member branches (clean survivors + dirty
    # replicas) — unmaterialized, the blocked Levenshtein join would
    # run twice.  localCheckpoint, NOT persist: a persist with no
    # unpersist stays in the CacheManager after this function returns,
    # and the next invocation's identical sub-plan would silently read
    # the previous run's cache (cross-invocation reuse the bench must
    # not see).  The checkpoint is per-invocation and freed by the
    # context cleaner.
    matches = (
        _fuzzy_matches(spark, sf_dir, base=base)
        .select("dirty_key", "matched_key")
        .localCheckpoint()
    )
    dirty = base.select(
        F.col("c_custkey").alias("dirty_key"),
        _dirty_name().alias("dirty_name"),
        F.col("c_acctbal").alias("dirty_bal"),
    )
    clean_members = (
        matches.select("matched_key").distinct()
        .join(base, F.col("matched_key") == F.col("c_custkey"))
        .select(
            F.col("matched_key").alias("entity"),
            F.col("c_name").alias("name"),
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias(
                "bal_cents"
            ),
        )
    )
    dirty_members = (
        matches.select("dirty_key", "matched_key")
        .join(dirty, "dirty_key")
        .select(
            F.col("matched_key").alias("entity"),
            F.col("dirty_name").alias("name"),
            (F.floor("dirty_bal").cast("bigint") * 100).alias("bal_cents"),
        )
    )
    members = clean_members.unionAll(dirty_members)
    # ONE aggregation pass: the longest-then-lexicographic survivor is
    # a min_by over (-length, name) — same total order the previous
    # row_number window expressed, without the window's sort pass; the
    # variant count rides as collect_set size instead of a
    # count-distinct (which would force a second aggregate expansion).
    # Fewer operators = fewer stages; the entity exchange is shared.
    return (
        members.groupBy("entity")
        .agg(
            F.min_by(
                "name",
                F.struct(
                    (-F.length("name")).alias("l"), F.col("name").alias("n")
                ),
            ).alias("golden_name"),
            F.max("bal_cents").alias("golden_bal_cents"),
            F.count(F.lit(1)).alias("n_members"),
            F.size(F.collect_set("name")).cast("bigint").alias(
                "n_name_variants"
            ),
        )
        .orderBy("entity")
    )


def _snm_pass_sql(tag: str, order: str) -> str:
    """One SNM neighbor pass as CTEs: window sorted by ``order`` inside
    the tail-digit block, next-2 neighbor pairs at lev 1..2, normalized
    pair identity."""
    return f"""
    nbr{tag} AS (
      SELECT key, name, src,
             LEAD(key, 1)  OVER w AS k1, LEAD(name, 1) OVER w AS n1,
             LEAD(src, 1)  OVER w AS s1,
             LEAD(key, 2)  OVER w AS k2, LEAD(name, 2) OVER w AS n2,
             LEAD(src, 2)  OVER w AS s2
      FROM recs
      WINDOW w AS (PARTITION BY right(name, (SELECT k FROM params))
                   ORDER BY {order}, src, key)
    ),
    cand{tag} AS (
      SELECT LEAST(a_key, b_key) AS lo, GREATEST(a_key, b_key) AS hi,
             LEAST(a_src, b_src) AS slo, GREATEST(a_src, b_src) AS shi,
             (a_key = b_key AND a_src <> b_src) AS is_true
      FROM (
        SELECT key AS a_key, src AS a_src, k1 AS b_key, s1 AS b_src,
               CAST(levenshtein(name, n1) AS INT) AS lev
        FROM nbr{tag} WHERE n1 IS NOT NULL
        UNION ALL
        SELECT key, src, k2, s2, CAST(levenshtein(name, n2) AS INT)
        FROM nbr{tag} WHERE n2 IS NOT NULL
      ) WHERE lev BETWEEN 1 AND 2
    )"""


@register(
    "er_snm_multipass",
    bench=True,
    oracle=f"""
    WITH params AS (
      SELECT {_tail_digits_sql('2 * COUNT(*)')} AS k FROM customer
    ),
    recs AS (
      SELECT c_custkey AS key, c_name AS name, 'clean' AS src FROM customer
      UNION ALL
      SELECT c_custkey, {_DIRTY_SQL}, 'dirty' FROM customer
    ),
    {_snm_pass_sql('1', "name")},
    {_snm_pass_sql('2', "reverse(name)")},
    u AS (
      SELECT DISTINCT lo, hi, slo, shi, is_true FROM
        (SELECT * FROM cand1 UNION ALL SELECT * FROM cand2)
    ),
    p1 AS (SELECT DISTINCT lo, hi, slo, shi, is_true FROM cand1)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p1) AS cand_pass1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS cand_multipass,
           (SELECT CAST(COUNT(*) FILTER (WHERE is_true) AS BIGINT) FROM p1)
             AS true_pass1,
           (SELECT CAST(COUNT(*) FILTER (WHERE is_true) AS BIGINT) FROM u)
             AS true_multipass,
           (SELECT CAST(COUNT(*) FILTER (WHERE is_true) AS BIGINT) FROM u)
           - (SELECT CAST(COUNT(*) FILTER (WHERE is_true) AS BIGINT) FROM p1)
             AS recovered_by_pass2
    """,
    tags=("er", "fuzzy", "window", "multipass", "W1"),
)
def er_snm_multipass(spark, sf_dir):
    """Multi-KEY Sorted Neighborhood — the textbook fix for
    single-sort-key blindness, executed instead of just documented:
    pass 1 sorts each tail-digit block by name (er_sorted_neighborhood
    — nearly blind here, because a mid-name corruption moves a record
    far from its twin in FORWARD order); pass 2 re-sorts the same
    blocks by reverse(name), where the twins' shared SUFFIX makes them
    adjacent.  Candidates union under a normalized pair identity and
    the row reports the economics: candidates and TRUE links (dirty
    twin meets its clean original) per pass, and how many true links
    only pass 2 recovered — on this fixture pass 2 lifts recall from
    ~0.4% to 100%, which is exactly why production SNM always runs
    multiple keys.  Each pass stays O(N*w) window work over
    ~constant-size partitions — recall is bought with a second linear
    pass, never a bigger block."""
    c = table(spark, sf_dir, "customer")
    k = _tail_digits(2 * _customer_count(spark, sf_dir))
    recs = c.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.lit("clean").alias("src"),
    ).unionAll(
        c.select(
            F.col("c_custkey").alias("key"),
            _dirty_name().alias("name"),
            F.lit("dirty").alias("src"),
        )
        # both SNM passes window over this union — materialized once per
        # invocation (localCheckpoint, not persist: no CacheManager entry
        # surviving into the next invocation)
    ).localCheckpoint()

    def snm_pass(order_col):
        w = Window.partitionBy(F.expr(f"right(name, {k})")).orderBy(
            order_col, "src", "key"
        )
        nbr = recs.select(
            "key",
            "name",
            "src",
            F.lead("key", 1).over(w).alias("k1"),
            F.lead("name", 1).over(w).alias("n1"),
            F.lead("src", 1).over(w).alias("s1"),
            F.lead("key", 2).over(w).alias("k2"),
            F.lead("name", 2).over(w).alias("n2"),
            F.lead("src", 2).over(w).alias("s2"),
        )
        pairs = (
            nbr.filter(F.col("n1").isNotNull())
            .select(
                F.col("key").alias("a_key"),
                F.col("src").alias("a_src"),
                F.col("k1").alias("b_key"),
                F.col("s1").alias("b_src"),
                F.levenshtein("name", "n1").cast("int").alias("lev"),
            )
            .unionAll(
                nbr.filter(F.col("n2").isNotNull()).select(
                    F.col("key").alias("a_key"),
                    F.col("src").alias("a_src"),
                    F.col("k2").alias("b_key"),
                    F.col("s2").alias("b_src"),
                    F.levenshtein("name", "n2").cast("int").alias("lev"),
                )
            )
            .filter(F.col("lev").between(1, 2))
        )
        return pairs.select(
            F.least("a_key", "b_key").alias("lo"),
            F.greatest("a_key", "b_key").alias("hi"),
            F.least("a_src", "b_src").alias("slo"),
            F.greatest("a_src", "b_src").alias("shi"),
            (
                (F.col("a_key") == F.col("b_key"))
                & (F.col("a_src") != F.col("b_src"))
            ).alias("is_true"),
        )

    # cand1 feeds both its own readout and the union — materialized once
    # per invocation; u has a single consumer, so it stays lazy (the old
    # .persist() on it bought nothing within a run and leaked across runs)
    cand1 = snm_pass(F.col("name")).distinct().localCheckpoint()
    u = cand1.unionAll(snm_pass(F.reverse("name"))).distinct()
    row1 = cand1.agg(
        F.count(F.lit(1)).alias("cand_pass1"),
        F.count(F.when(F.col("is_true"), 1)).alias("true_pass1"),
    )
    rowu = u.agg(
        F.count(F.lit(1)).alias("cand_multipass"),
        F.count(F.when(F.col("is_true"), 1)).alias("true_multipass"),
    )
    return (
        row1.crossJoin(rowu)
        .select(
            "cand_pass1",
            "cand_multipass",
            "true_pass1",
            "true_multipass",
            (F.col("true_multipass") - F.col("true_pass1")).alias(
                "recovered_by_pass2"
            ),
        )
    )


@register(
    "er_agreement_patterns",
    oracle=f"""
    WITH params AS (
      SELECT {_tail_digits_sql('COUNT(*)')} AS k FROM customer
    ),
    dirty AS (
      SELECT c_custkey AS dk, {_DIRTY_SQL} AS dname,
             CAST(floor(c_acctbal) AS BIGINT) AS dbal,
             c_nationkey AS dnat,
             right({_DIRTY_SQL}, (SELECT k FROM params)) AS blk
      FROM customer
    ),
    clean AS (
      SELECT c_custkey AS ck, c_name AS cname,
             CAST(floor(c_acctbal) AS BIGINT) AS cbal,
             c_nationkey AS cnat,
             right(c_name, (SELECT k FROM params)) AS blk
      FROM customer
    ),
    pairs AS (
      SELECT d.dk, c.ck,
             LEAST(CAST(levenshtein(d.dname, c.cname) AS INT), 3) AS name_band,
             CAST(d.dbal = c.cbal AS INT) AS bal_agree,
             CAST(d.dnat = c.cnat AS INT) AS nat_agree,
             CAST(d.dk = c.ck AS INT) AS is_match
      FROM dirty d JOIN clean c USING (blk)
      WHERE abs(length(d.dname) - length(c.cname)) <= 2
    ),
    tot AS (
      SELECT CAST(SUM(is_match) AS BIGINT) AS n_match,
             CAST(COUNT(*) - SUM(is_match) AS BIGINT) AS n_nonmatch
      FROM pairs
    )
    SELECT p.name_band, p.bal_agree, p.nat_agree,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(p.is_match) AS BIGINT) AS n_matches,
           CAST(SUM(p.is_match) * 1000000 // t.n_match AS BIGINT) AS m_ppm,
           CAST((COUNT(*) - SUM(p.is_match)) * 1000000 // t.n_nonmatch
                AS BIGINT) AS u_ppm
    FROM pairs p, tot t
    GROUP BY p.name_band, p.bal_agree, p.nat_agree, t.n_match, t.n_nonmatch
    ORDER BY p.name_band, p.bal_agree, p.nat_agree
    """,
    tags=("er", "fellegi-sunter", "linkage", "A4"),
)
def er_agreement_patterns(spark, sf_dir):
    """Fellegi–Sunter groundwork: the agreement-pattern frequency
    table probabilistic record linkage estimates its m/u weights from.
    Every within-block candidate pair gets an agreement vector —
    name edit-distance band (0/1/2/3+), dollar-balance agreement,
    nation agreement — and each pattern reports m = P(pattern | match)
    and u = P(pattern | non-match) as integer ppm (the labels come
    from the fixture's known ground truth; in production an EM loop
    replaces them).  log-weights stay OFF the oracle surface
    (transcendental) — m/u ppm are the exact sufficient statistics.
    Shape: the same blocked O(N*const) candidate join as the match
    query, then a map-side aggregate into <= 16 pattern cells."""
    c = table(spark, sf_dir, "customer")
    k = _tail_digits(_customer_count(spark, sf_dir))
    dirty = c.select(
        F.col("c_custkey").alias("dk"),
        _dirty_name().alias("dname"),
        F.floor("c_acctbal").cast("bigint").alias("dbal"),
        F.col("c_nationkey").alias("dnat"),
    ).withColumn("blk", F.expr(f"right(dname, {k})"))
    clean = c.select(
        F.col("c_custkey").alias("ck"),
        F.col("c_name").alias("cname"),
        F.floor("c_acctbal").cast("bigint").alias("cbal"),
        F.col("c_nationkey").alias("cnat"),
        F.expr(f"right(c_name, {k})").alias("blk"),
    )
    pairs = (
        dirty.join(clean, "blk")
        .filter(F.abs(F.length("dname") - F.length("cname")) <= 2)
        .select(
            F.least(
                F.when(F.levenshtein("dname", "cname", 3) < 0, 3).otherwise(
                    F.levenshtein("dname", "cname", 3)
                ),
                F.lit(3),
            )
            .cast("int")
            .alias("name_band"),
            (F.col("dbal") == F.col("cbal")).cast("int").alias("bal_agree"),
            (F.col("dnat") == F.col("cnat")).cast("int").alias("nat_agree"),
            (F.col("dk") == F.col("ck")).cast("int").alias("is_match"),
        )
    )
    tot = pairs.agg(
        F.sum("is_match").cast("bigint").alias("n_match"),
        (F.count(F.lit(1)) - F.sum("is_match")).cast("bigint").alias("n_nonmatch"),
    )
    return (
        pairs.groupBy("name_band", "bal_agree", "nat_agree")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("is_match").cast("bigint").alias("n_matches"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "name_band",
            "bal_agree",
            "nat_agree",
            "n_pairs",
            "n_matches",
            F.expr("n_matches * 1000000 div n_match").alias("m_ppm"),
            F.expr("(n_pairs - n_matches) * 1000000 div n_nonmatch").alias(
                "u_ppm"
            ),
        )
        .orderBy("name_band", "bal_agree", "nat_agree")
    )


# -- unsupervised Fellegi–Sunter: EM parameter estimation -------------------

_EM_INIT = {"m": 900_000, "u": 100_000, "lam": 10_000}  # ppm priors


def _em_iter_sql(i: int) -> str:
    """One EM iteration as CTE text: p{i-1} (m1,u1,m2,u2,m3,u3,lam) ×
    cells (a1,a2,a3,n) → p{i}.  All arithmetic integer ppm."""
    prev, s, w, cur = f"p{i-1}", f"s{i}", f"w{i}", f"p{i}"

    def prod(p):
        return (
            f"((CASE WHEN a1 = 1 THEN {p}1 ELSE 1000000 - {p}1 END)"
            f" * (CASE WHEN a2 = 1 THEN {p}2 ELSE 1000000 - {p}2 END)"
            f" // 1000000)"
            f" * (CASE WHEN a3 = 1 THEN {p}3 ELSE 1000000 - {p}3 END)"
            f" // 1000000"
        )

    # M-step sums accumulate n·w (w ≤ 10^6) and then rescale by 10^6:
    # in int64 that overflows past ~9×10^6 candidate pairs, so the
    # accumulation runs in HUGEINT (Spark mirror: DECIMAL(38,0)) —
    # headroom to ~10^25 pairs; quotients are ≤ 10^6 so the final
    # BIGINT cast is always safe.  w itself is clamped to [0, 10^6]:
    # the denominator's // 1000000 rescale can otherwise let the
    # quotient overshoot 10^6 when ug ≈ 0, making n·(10^6 − w)
    # negative — and DuckDB's // floors while Spark's div truncates
    # toward zero on negatives, so the engines would diverge by one.
    m_cols = ", ".join(
        f"CAST(SUM(CASE WHEN a{j} = 1 THEN CAST(n AS HUGEINT) * w"
        f" ELSE 0 END) * 1000000"
        f" // GREATEST(SUM(CAST(n AS HUGEINT) * w), 1) AS BIGINT) AS m{j}"
        for j in (1, 2, 3)
    )
    u_cols = ", ".join(
        f"CAST(SUM(CASE WHEN a{j} = 1 THEN CAST(n AS HUGEINT)"
        f" * (1000000 - w) ELSE 0 END)"
        f" * 1000000 // GREATEST(SUM(CAST(n AS HUGEINT)"
        f" * (1000000 - w)), 1) AS BIGINT)"
        f" AS u{j}"
        for j in (1, 2, 3)
    )
    return f"""
    {s} AS (
      SELECT c.a1, c.a2, c.a3, c.n,
             {prod('m')} AS mg, {prod('u')} AS ug, lam
      FROM cells c, {prev}
    ),
    {w} AS (
      SELECT a1, a2, a3, n,
             LEAST(1000000, (lam * mg) // GREATEST(
               (lam * mg + (1000000 - lam) * ug) // 1000000, 1)) AS w
      FROM {s}
    ),
    {cur} AS (
      SELECT {m_cols}, {u_cols},
             CAST(SUM(CAST(n AS HUGEINT) * w)
                  // GREATEST(SUM(n), 1) AS BIGINT) AS lam
      FROM {w}
    )"""


def _em_iter_spark(cells, params):
    """The Spark mirror of one EM iteration (tiny DFs: ≤16 cells × a
    broadcast 1-row parameter vector)."""

    def prod(p):
        return F.expr(
            f"((CASE WHEN a1 = 1 THEN {p}1 ELSE 1000000 - {p}1 END)"
            f" * (CASE WHEN a2 = 1 THEN {p}2 ELSE 1000000 - {p}2 END)"
            f" div 1000000)"
            f" * (CASE WHEN a3 = 1 THEN {p}3 ELSE 1000000 - {p}3 END)"
            f" div 1000000"
        )

    scored = cells.crossJoin(F.broadcast(params)).select(
        "a1",
        "a2",
        "a3",
        "n",
        prod("m").alias("mg"),
        prod("u").alias("ug"),
        "lam",
    )
    weighted = scored.select(
        "a1",
        "a2",
        "a3",
        "n",
        # clamped to [0, 10^6] — see _em_iter_sql for why
        F.expr(
            "least(1000000, (lam * mg) div greatest("
            "(lam * mg + (1000000 - lam) * ug) div 1000000, 1))"
        ).alias("w"),
    )
    # DECIMAL(38,0) accumulation mirrors the oracle's HUGEINT — the
    # int64 cliff at ~9e6 candidate pairs is gone (headroom ~10^25)
    nw = "CAST(n AS DECIMAL(38,0))"
    aggs = (
        [
            F.expr(
                f"CAST(sum(CASE WHEN a{j} = 1 THEN {nw} * w ELSE 0 END)"
                f" * 1000000 div greatest(sum({nw} * w), 1) AS BIGINT)"
            ).alias(f"m{j}")
            for j in (1, 2, 3)
        ]
        + [
            F.expr(
                f"CAST(sum(CASE WHEN a{j} = 1 THEN {nw} * (1000000 - w)"
                f" ELSE 0 END) * 1000000"
                f" div greatest(sum({nw} * (1000000 - w)), 1) AS BIGINT)"
            ).alias(f"u{j}")
            for j in (1, 2, 3)
        ]
        + [
            F.expr(
                f"CAST(sum({nw} * w) div greatest(sum(n), 1) AS BIGINT)"
            ).alias("lam")
        ]
    )
    return weighted.agg(*aggs)


@register(
    "er_em_weight_estimation",
    oracle=f"""
    WITH params AS (
      SELECT {_tail_digits_sql('COUNT(*)')} AS k FROM customer
    ),
    dirty AS (
      SELECT c_custkey AS dk, {_DIRTY_SQL} AS dname,
             CAST(floor(c_acctbal) AS BIGINT) AS dbal,
             c_nationkey AS dnat,
             right({_DIRTY_SQL}, (SELECT k FROM params)) AS blk
      FROM customer
    ),
    clean AS (
      SELECT c_custkey AS ck, c_name AS cname,
             CAST(floor(c_acctbal) AS BIGINT) AS cbal,
             c_nationkey AS cnat,
             right(c_name, (SELECT k FROM params)) AS blk
      FROM customer
    ),
    pairs AS (
      SELECT LEAST(CAST(levenshtein(d.dname, c.cname) AS INT), 3)
               AS name_band,
             CAST(d.dbal = c.cbal AS INT) AS bal_agree,
             CAST(d.dnat = c.cnat AS INT) AS nat_agree
      FROM dirty d JOIN clean c USING (blk)
      WHERE abs(length(d.dname) - length(c.cname)) <= 2
    ),
    cells AS (
      SELECT CAST(name_band = 0 AS INT) AS a1,
             bal_agree AS a2, nat_agree AS a3,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs GROUP BY 1, 2, 3
    ),
    p0 AS (
      SELECT CAST({_EM_INIT['m']} AS BIGINT) AS m1,
             CAST({_EM_INIT['u']} AS BIGINT) AS u1,
             CAST({_EM_INIT['m']} AS BIGINT) AS m2,
             CAST({_EM_INIT['u']} AS BIGINT) AS u2,
             CAST({_EM_INIT['m']} AS BIGINT) AS m3,
             CAST({_EM_INIT['u']} AS BIGINT) AS u3,
             CAST({_EM_INIT['lam']} AS BIGINT) AS lam
    ),{_em_iter_sql(1)},{_em_iter_sql(2)}
    SELECT lam AS lambda_ppm,
           m1 AS m_name_ppm, u1 AS u_name_ppm,
           m2 AS m_bal_ppm, u2 AS u_bal_ppm,
           m3 AS m_nat_ppm, u3 AS u_nat_ppm
    FROM p2
    """,
    tags=("er", "fellegi-sunter", "em", "linkage"),
)
def er_em_weight_estimation(spark, sf_dir):
    """UNSUPERVISED Fellegi–Sunter parameter estimation — the EM loop
    er_agreement_patterns deliberately left out (its m/u came from the
    fixture's ground-truth labels; production linkage has none): two
    EM iterations over the agreement-pattern cells under the standard
    conditional-independence model, starting from the textbook priors
    (m=0.9, u=0.1, λ=0.01).  E-step: per-pattern posterior match
    probability w_γ = λm_γ / (λm_γ + (1-λ)u_γ) with naive-Bayes
    per-field products; M-step: re-estimate each field's m, u and the
    prevalence λ from the n_γ-weighted posteriors.  EVERY step is
    integer ppm arithmetic (products rescaled by 10^6 after each
    multiply), so both engines walk the exact same EM trajectory —
    no float likelihoods to drift.

    Scale shape: the blocked candidate join is the same O(N·const)
    pair generator as the rest of the ER family; everything after is
    a ≤16-row cell table — EM itself costs nothing at any scale.
    The M-step accumulates Σ(n·w)·10^6 in 128-bit (DECIMAL(38,0) on
    Spark, HUGEINT in the oracle), so the old ~9×10^6-pair int64
    cliff is gone — headroom now ~10^25 pairs at full ppm weight
    resolution (tests/test_er_em.py pins an adversarial 10^13-pair
    cell table against an exact big-int reference).  Output: one row
    of estimated (λ, m_j, u_j) — the weights a production linker
    would then score er_blocked_fuzzy_match's pairs with."""
    c = table(spark, sf_dir, "customer")
    k = _tail_digits(_customer_count(spark, sf_dir))
    dirty = c.select(
        F.col("c_custkey").alias("dk"),
        _dirty_name().alias("dname"),
        F.floor("c_acctbal").cast("bigint").alias("dbal"),
        F.col("c_nationkey").alias("dnat"),
    ).withColumn("blk", F.expr(f"right(dname, {k})"))
    clean = c.select(
        F.col("c_custkey").alias("ck"),
        F.col("c_name").alias("cname"),
        F.floor("c_acctbal").cast("bigint").alias("cbal"),
        F.col("c_nationkey").alias("cnat"),
        F.expr(f"right(c_name, {k})").alias("blk"),
    )
    pairs = (
        dirty.join(clean, "blk")
        .filter(F.abs(F.length("dname") - F.length("cname")) <= 2)
        .select(
            F.least(
                F.when(F.levenshtein("dname", "cname", 3) < 0, 3).otherwise(
                    F.levenshtein("dname", "cname", 3)
                ),
                F.lit(3),
            )
            .cast("int")
            .alias("name_band"),
            (F.col("dbal") == F.col("cbal")).cast("int").alias("bal_agree"),
            (F.col("dnat") == F.col("cnat")).cast("int").alias("nat_agree"),
        )
    )
    cells = pairs.groupBy(
        (F.col("name_band") == 0).cast("int").alias("a1"),
        F.col("bal_agree").alias("a2"),
        F.col("nat_agree").alias("a3"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    params = spark.range(1).select(
        *[
            F.lit(_EM_INIT["m"]).cast("bigint").alias(f"m{j}")
            for j in (1, 2, 3)
        ],
        *[
            F.lit(_EM_INIT["u"]).cast("bigint").alias(f"u{j}")
            for j in (1, 2, 3)
        ],
        F.lit(_EM_INIT["lam"]).cast("bigint").alias("lam"),
    )
    for _ in range(2):
        params = _em_iter_spark(cells, params)
    return params.select(
        F.col("lam").alias("lambda_ppm"),
        F.col("m1").alias("m_name_ppm"),
        F.col("u1").alias("u_name_ppm"),
        F.col("m2").alias("m_bal_ppm"),
        F.col("u2").alias("u_bal_ppm"),
        F.col("m3").alias("m_nat_ppm"),
        F.col("u3").alias("u_nat_ppm"),
    )


@register(
    "er_match_quality_audit",
    oracle=_ER_MATCH_CTES
    + """
    , per_lev AS (
      SELECT lev, COUNT(*) AS n_links, SUM(is_correct) AS n_correct
      FROM matches GROUP BY lev
    ),
    tot AS (
      SELECT SUM(n_links) AS links, SUM(n_correct) AS correct,
             (SELECT COUNT(*) FROM customer) AS truth
      FROM per_lev
    )
    SELECT p.lev,
           CAST(p.n_links AS BIGINT) AS n_links,
           CAST(p.n_correct AS BIGINT) AS n_correct,
           CAST(p.n_correct * 1000000 // p.n_links AS BIGINT)
             AS lev_precision_ppm,
           CAST(t.correct * 1000000 // t.links AS BIGINT)
             AS overall_precision_ppm,
           CAST(t.correct * 1000000 // t.truth AS BIGINT)
             AS overall_recall_ppm
    FROM per_lev p, tot t
    ORDER BY p.lev
    """,
    tags=("er", "evaluation", "precision-recall"),
)
def er_match_quality_audit(spark, sf_dir):
    """MATCH-QUALITY EVALUATION of the blocked fuzzy matcher — the
    precision/recall report an ER pipeline publishes before anyone
    trusts its links, computable here WITHOUT human labels because the
    corruption is deterministic (ground truth: every dirty record's
    one true match is its own key): per edit distance, link count,
    correct count and precision; overall precision (correct / accepted
    links) and recall (correct / |truth|) in exact integer ppm riding
    every row.  The lev=0 stratum is exact-match links (expected
    ~perfect); precision decay across lev 1→2 is the evidence for
    where to put the acceptance threshold.

    Scale shape: one rollup over the already-bounded match table
    (blocking caps candidates; see er_blocked_fuzzy_match) plus a
    3-row broadcast of the totals — the evaluation adds nothing to
    the matcher's own cost."""
    matches = _fuzzy_matches(spark, sf_dir)
    per_lev = matches.groupBy("lev").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.sum("is_correct").alias("n_correct"),
    )
    truth = _customer_count(spark, sf_dir)
    tot = per_lev.agg(
        F.sum("n_links").alias("links"),
        F.sum("n_correct").alias("correct"),
    )
    return (
        per_lev.crossJoin(F.broadcast(tot))
        .select(
            "lev",
            F.col("n_links").cast("bigint").alias("n_links"),
            F.col("n_correct").cast("bigint").alias("n_correct"),
            F.expr("CAST(n_correct * 1000000 div n_links AS BIGINT)").alias(
                "lev_precision_ppm"
            ),
            F.expr("CAST(correct * 1000000 div links AS BIGINT)").alias(
                "overall_precision_ppm"
            ),
            F.expr(
                f"CAST(correct * 1000000 div {truth} AS BIGINT)"
            ).alias("overall_recall_ppm"),
        )
        .orderBy("lev")
    )

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
fuzzy join shuffles on (block) and compares only within-block pairs
(~|block|^2 per block, never |table|^2); the block histogram is the
thing to monitor, same as the shingle-frequency caps in llm/dedup.
Sorted-neighborhood partitions its window by a name-prefix block, so
each partition sorts locally (w-1 candidate pairs are lost at each
block boundary — the standard multi-pass SNM answer is a second pass
on a shifted key, which is just this query with another prefix).
GDPR propagation is two broadcast semi-joins and one key-hash
semi-join (orders->lineitem), each a single pass.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

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


@register(
    "er_blocked_fuzzy_match",
    bench=True,
    oracle=f"""
    WITH dirty AS (
      SELECT c_custkey AS dirty_key, {_DIRTY_SQL} AS dirty_name,
             right({_DIRTY_SQL}, 2) AS blk
      FROM customer
    ),
    clean AS (SELECT c_custkey AS clean_key, c_name, right(c_name, 2) AS blk
              FROM customer),
    scored AS (
      SELECT d.dirty_key, c.clean_key,
             CAST(levenshtein(d.dirty_name, c.c_name) AS INT) AS lev,
             ROW_NUMBER() OVER (PARTITION BY d.dirty_key
                                ORDER BY levenshtein(d.dirty_name, c.c_name),
                                         c.clean_key) AS rn
      FROM dirty d JOIN clean c USING (blk)
    )
    SELECT dirty_key, clean_key AS matched_key, lev,
           CAST(CASE WHEN dirty_key = clean_key THEN 1 ELSE 0 END AS INT) AS is_correct
    FROM scored
    WHERE rn = 1 AND lev <= 2
    """,
    tags=("er", "fuzzy", "levenshtein", "J3"),
)
def er_blocked_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy self-linkage: a deterministically corrupted
    replica of customer (<=1 edit per name) is matched back against
    the clean dimension.  Candidates are generated ONLY within a
    blocking key (last two name characters, which the corruption
    preserves) — ~1% of the all-pairs cross product — then scored
    with Levenshtein and resolved to the single best match per dirty
    record (min distance, min key tie-break, distance <= 2 accepted).
    The block join shuffles both sides on the 2-char block; per-block
    work is |block|^2 Levenshteins, which is what the block-size
    histogram (profile_table_summary) is there to police at scale."""
    c = table(spark, sf_dir, "customer")
    dirty = c.select(
        F.col("c_custkey").alias("dirty_key"),
        _dirty_name().alias("dirty_name"),
    ).withColumn("blk", F.expr("right(dirty_name, 2)"))
    clean = c.select(
        F.col("c_custkey").alias("clean_key"),
        "c_name",
        F.expr("right(c_name, 2)").alias("blk"),
    )
    lev = F.levenshtein("dirty_name", "c_name")
    rn = F.row_number().over(
        Window.partitionBy("dirty_key").orderBy(lev, F.col("clean_key"))
    )
    return (
        dirty.join(clean, "blk")
        .select(
            "dirty_key",
            F.col("clean_key").alias("matched_key"),
            lev.cast("int").alias("lev"),
            F.when(F.col("dirty_key") == F.col("clean_key"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_correct"),
            rn.alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("lev") <= 2))
        .drop("rn")
    )


@register(
    "er_sorted_neighborhood",
    oracle=f"""
    WITH recs AS (
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
      WINDOW w AS (PARTITION BY substr(name, 1, 14) ORDER BY name, src, key)
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
    sorted by name WITHIN a coarse name-prefix block, and each record
    is compared only to its next 2 neighbors in sort order — candidate
    generation is O(N*w) with zero joins (one window sort).  Pairs at
    distance 1..2 surface the linkage candidates; identical strings
    (lev 0) are exact dups handled by dedup_exact.  The prefix block
    keeps the sort partition-local at scale (the classic SNM boundary
    loss — w-1 pairs per block edge — is recovered by a second pass on
    a shifted key, not by a global sort)."""
    c = table(spark, sf_dir, "customer")
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
    w = Window.partitionBy(F.substring("name", 1, 14)).orderBy("name", "src", "key")
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

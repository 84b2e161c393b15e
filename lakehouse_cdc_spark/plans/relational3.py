"""Third wave of relational declared queries: the remaining TPC-H
query *shapes* expressible on the reduced testdata schema (no
l_shipmode/l_commitdate/c_phone columns exist, so each query keeps the
canonical plan shape — EXISTS probe, nation-pair volume, market-share
ratio, distribution, having-filtered top-k, disjunctive brackets,
anti-join + scalar subquery — on the columns that do).

Determinism: all money sums through dsum/fixed-point (see registry),
all rankings totally ordered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_cdc_spark.plans.registry import (
    davg,
    dsum,
    fixed_point,
    register,
    sql_dsum,
    sql_fixed_point,
    table,
)

_VOLUME = "l_extendedprice * (1.0 - l_discount)"


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_cnt
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "q4", "exists", "semi-join"),
)
def q4_priority_exists(spark, sf_dir):
    """TPC-H q4 shape: orders in a quarter with at least one
    late-shipped line (>60 days after order date — the fixture has no
    l_commitdate, so lateness is ship-vs-order), counted by priority.
    EXISTS plans as a LeftSemi join — one pass, no fan-out."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_cnt")
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             {_VOLUME} AS volume
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
         OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "q7", "multi-join"),
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H q7: trade volume between a nation pair by ship year.
    Both nation dims broadcast (self-joined twice under different
    aliases); the disjunctive pair filter sits on the broadcast side
    so the fact scan stays full-rate."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nc = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    ns = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    vol = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(vol, "revenue"))


@register(
    "q8_market_share",
    bench=True,
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN {sql_fixed_point('volume')} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({sql_fixed_point('volume')}) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             {_VOLUME} AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
    tags=("tpch", "q8", "ratio"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H q8: NATION_3's share of ECONOMY-part revenue among
    EUROPE customers, by order year.  The share is a ratio of two
    EXACT fixed-point sums (numerator CASE'd, denominator total)
    divided once as doubles — deterministic in any engine and under
    any partitioning, unlike sum(double)/sum(double)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nc = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    ns = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nkey"))
    )
    vol_fp = fixed_point(F.col("l_extendedprice") * (1.0 - F.col("l_discount")))
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", vol_fp).otherwise(F.lit(0))
    )
    den = F.sum(vol_fp)
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (num.cast("double") / den.cast("double")).alias("mkt_share")
    )


@register(
    "q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch", "q13", "left-join", "distribution"),
)
def q13_custdist(spark, sf_dir):
    """TPC-H q13: distribution of customers by order count — a
    two-level aggregation over a left join (COUNT of a nullable
    column counts only matches, so 0-order customers survive)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q18_large_orders",
    bench=True,
    oracle=f"""
    SELECT c_name, o_orderkey, o_orderdate_s, total_qty
    FROM (
      SELECT c.c_name, o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
             CAST(SUM({sql_fixed_point('l.l_quantity')}) AS DOUBLE) / 10000.0 AS total_qty
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
      HAVING CAST(SUM({sql_fixed_point('l.l_quantity')}) AS DOUBLE) / 10000.0 > 210.0
    )
    ORDER BY total_qty DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("tpch", "q18", "having", "topk"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H q18: large-volume orders — aggregate-then-HAVING, joined
    to the customer dim, global top-100 (TakeOrderedAndProject; the
    HAVING prunes before the sort so only qualifying orders rank).

    Plan shape: the quantity aggregate runs on lineitem ALONE keyed by
    l_orderkey (o_orderkey functionally determines c_name and
    o_orderdate, so grouping pre-join is identical to the literal
    group-after-join formulation — the classic q18 rewrite), and the
    HAVING prunes to a handful of orders BEFORE any join: both the
    orders and customer joins then broadcast the tiny qualifying set
    instead of shuffling the fact-fact join at full width."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    qty = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 210.0)
    )
    agg = (
        qty.join(o, qty.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        agg.select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT {sql_dsum(_VOLUME, 'revenue')}, COUNT(*) AS line_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'BRAND_1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'BRAND_2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 35)
       OR (p.p_brand = 'BRAND_3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
    tags=("tpch", "q19", "disjunctive"),
)
def q19_bracket_revenue(spark, sf_dir):
    """TPC-H q19: disjunctive bracket predicates spanning both join
    sides — the optimizer keeps the join equi (l_partkey = p_partkey)
    and evaluates the OR brackets post-join; part is broadcast so
    the brackets run map-side."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "BRAND_1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "BRAND_2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "BRAND_3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    vol = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return j.filter(bracket).agg(
        dsum(vol, "revenue"), F.count(F.lit(1)).alias("line_cnt")
    )


@register(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(SUM({sql_fixed_point('c_acctbal')}) AS DOUBLE)
             / 10000.0 / CAST(COUNT(*) AS DOUBLE) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT cohort, COUNT(*) AS numcust, {sql_dsum('c_acctbal', 'total_bal')}
    FROM (
      SELECT c.c_custkey % 7 AS cohort, c.c_acctbal
      FROM customer c, avg_bal
      WHERE c.c_acctbal > avg_bal.a
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    )
    GROUP BY cohort
    """,
    tags=("tpch", "q22", "anti-join", "scalar-subquery"),
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H q22 shape: customers with above-average balance and no
    RECENT order (none since 2000 — every fixture customer has SOME
    order, so recency keeps the anti-join non-vacuous), grouped by
    cohort (custkey mod 7 stands in for the absent phone prefix).  Scalar avg subquery broadcast as a 1-row cross
    join; NOT EXISTS plans as LeftAnti — no fan-out, no driver
    round-trip.  The average is an exact fixed-point mean."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(davg(F.col("c_acctbal"), "a"))
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy((F.col("c_custkey") % 7).alias("cohort")).agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal"), "total_bal"),
    )


# ---------------------------------------------------------------------------
# Multiset set-ops, UNPIVOT, null-safe join (remaining algebra surface)
# ---------------------------------------------------------------------------


@register(
    "set_ops_all_variants",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'error')) AS n_intersect_all,
      (SELECT COUNT(*) FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'error')) AS n_except_all
    """,
    tags=("setop", "multiset"),
)
def set_ops_all_variants(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL — bag semantics with multiplicity
    (min/difference of per-row counts), distinct from the set forms
    already covered.  Planned as aggregate+join under the hood, no
    driver logic."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id")
    errors = e.filter(F.col("event_type") == "error").select("user_id")
    ia = purchases.intersectAll(errors).agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    ea = purchases.exceptAll(errors).agg(F.count(F.lit(1)).alias("n_except_all"))
    return ia.crossJoin(ea)


@register(
    "unpivot_part_metrics",
    oracle=f"""
    SELECT metric, COUNT(*) AS n, {sql_dsum('val', 'total')}
    FROM (
      SELECT 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT 'retail' AS metric, p_retailprice AS val FROM part
    )
    GROUP BY metric
    """,
    tags=("unpivot", "reshape"),
)
def unpivot_part_metrics(spark, sf_dir):
    """UNPIVOT (wide→long reshape, the inverse of the pivot query):
    two part measures melted into (metric, val) rows via unpivot —
    pure projection fan-out, no shuffle until the final aggregate."""
    p = table(spark, sf_dir, "part")
    long = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retail"),
    ).unpivot(
        ids=["p_partkey"],
        values=["size", "retail"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("val"), "total")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH k AS (SELECT nullif(user_id % 10, 0) AS k, value FROM events),
    l AS (SELECT k, COUNT(*) AS cnt_l FROM k GROUP BY k),
    r AS (SELECT k, COUNT(*) AS cnt_r FROM k WHERE value > 50.0 GROUP BY k)
    SELECT COALESCE(CAST(l.k AS VARCHAR), 'NULL') AS key_s,
           l.cnt_l, COALESCE(r.cnt_r, 0) AS cnt_r
    FROM l LEFT JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    tags=("join", "null-safe"),
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics MERGE needs
    for nullable business keys.  A plain equality join would silently
    drop the NULL group; the oracle proves the null bucket joins."""
    e = table(spark, sf_dir, "events").select(
        F.nullif(F.col("user_id") % 10, F.lit(0)).alias("k"), "value"
    )
    left = e.groupBy("k").agg(F.count(F.lit(1)).alias("cnt_l"))
    right = (
        e.filter(F.col("value") > 50.0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt_r"))
    )
    j = left.join(right, left.k.eqNullSafe(right.k), "left")
    return j.select(
        F.coalesce(left.k.cast("string"), F.lit("NULL")).alias("key_s"),
        "cnt_l",
        F.coalesce(F.col("cnt_r"), F.lit(0)).alias("cnt_r"),
    )


@register(
    "agg_hll_mergeable_rollup",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS event_cnt,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS day_distinct_exact
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS range_distinct_exact
      FROM events
    )
    SELECT day, event_cnt, day_distinct_exact,
           TRUE AS day_within_5pct,
           range_distinct_exact,
           TRUE AS range_within_5pct
    FROM daily, tot
    ORDER BY day
    """,
    tags=("agg", "sketch", "A3-scale", "rollup"),
)
def agg_hll_mergeable_rollup(spark, sf_dir):
    """MERGEABLE distinct-count sketches — the pattern behind every
    100 TB dashboard: build one HLL sketch per day partition
    (hll_sketch_agg, map-side), persistable as bytes, then roll any
    date range up by UNIONING sketches (hll_union_agg) instead of
    rescanning raw data.  Output: per-day estimates + the unioned
    whole-range estimate on every row for comparison.

    The 5% accuracy contract is ON the oracle surface: per-day and
    unioned-range estimates are compared against the exact distinct
    counts computed alongside, and the emitted within-5% flags
    hash-verify against the DuckDB oracle's (exact, TRUE) — proving
    both the sketch accuracy AND the union merge on this dataset.
    At 100 TB only the sketch arms run; the exact arms exist here to
    make the bound verifiable."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("event_cnt"),
        F.countDistinct("user_id").alias("day_distinct_exact"),
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
            "range_distinct_est"
        )
    )
    total_exact = e.agg(
        F.countDistinct("user_id").alias("range_distinct_exact")
    )
    within = lambda est, exact: (
        F.abs(F.col(est) - F.col(exact)) <= F.lit(0.05) * F.col(exact)
    )
    return (
        daily.withColumn(
            "day_distinct_est",
            F.hll_sketch_estimate("sk").cast("bigint"),
        )
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(total_exact))
        .select(
            "day",
            "event_cnt",
            "day_distinct_exact",
            within("day_distinct_est", "day_distinct_exact").alias(
                "day_within_5pct"
            ),
            "range_distinct_exact",
            within("range_distinct_est", "range_distinct_exact").alias(
                "range_within_5pct"
            ),
        )
        .orderBy("day")
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_tp, last_tp, nth2_tp,
           round(pr, 6) AS pr, round(cd, 6) AS cd
    FROM (
      SELECT o_orderkey, o_custkey,
             first_value(o_totalprice) OVER w AS first_tp,
             last_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_tp,
             nth_value(o_totalprice, 2) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nth2_tp,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    )
    WHERE o_custkey % 100 = 0
    """,
    tags=("window", "value-functions"),
)
def window_value_functions(spark, sf_dir):
    """The remaining window value/rank functions in one pass:
    first/last/nth_value over an unbounded frame (last_value on the
    default frame is a footgun — it sees only up to CURRENT ROW, so
    the frame is made explicit), percent_rank and cume_dist (rounded:
    their divisions are correctly-rounded IEEE, but rounding guards
    ulp drift).  Sampled customers keep the surface small."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    ordering = [F.asc("o_orderdate"), F.asc("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*ordering)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.first("o_totalprice").over(wfull).alias("first_tp"),
            F.last("o_totalprice").over(wfull).alias("last_tp"),
            F.nth_value("o_totalprice", 2).over(wfull).alias("nth2_tp"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .filter(F.col("o_custkey") % 100 == 0)
    )


@register(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           (SELECT MAX(o.o_totalprice) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
    WHERE c.c_custkey % 50 = 0
    """,
    tags=("subquery", "correlated", "scalar"),
)
def subquery_correlated_scalar(spark, sf_dir):
    """Correlated SCALAR subquery (one value per outer row) — Catalyst
    decorrelates it into a left outer aggregate join, exactly what you
    would hand-write; declared in SQL form to exercise the
    decorrelation path itself."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_cs")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               (SELECT MAX(o.o_totalprice) FROM orders_cs o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer_cs c
        WHERE c.c_custkey % 50 = 0
        """
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum(_VOLUME, 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "q15", "max-of-agg"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H q15: the supplier(s) with maximum quarterly revenue — an
    aggregate feeding a scalar MAX over itself.  The revenue subplan
    is built once and referenced twice (ReusedExchange at runtime);
    exact fixed-point revenue makes the MAX tie-set deterministic, so
    no LIMIT hack is needed."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    vol = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(vol, "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({sql_fixed_point('l.l_extendedprice')}) AS DOUBLE)
             / 10000.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, CAST(SUM({sql_fixed_point('l_quantity')}) AS DOUBLE)
               / 10000.0 / CAST(COUNT(*) AS DOUBLE) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'BRAND_1'
      AND l.l_quantity < 0.5 * a.avg_qty
    """,
    tags=("tpch", "q17", "correlated-agg"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H q17 shape: revenue from below-half-average-quantity lines
    of one brand — the correlated per-part AVG decorrelated into an
    explicit aggregate join (exactly Catalyst's rewrite, written out
    so the oracle matches structurally).  The per-part average is an
    exact fixed-point mean: a correlated threshold computed in floats
    would make the `<` comparison engine-dependent at the boundary."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "BRAND_1")
        .select("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg(F.col("l_quantity"), "avg_qty")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    )
    return j.agg(
        (
            F.sum(fixed_point(F.col("l_extendedprice"))).cast("double")
            / 10000.0
            / 7.0
        ).alias("avg_yearly")
    )


@register(
    "checksum_merkle_partitions",
    oracle="""
    WITH rows_h AS (
      SELECT l_orderkey // 4096 AS part_id,
             md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                 CAST(l_linenumber AS VARCHAR) || '|' ||
                 CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      AS VARCHAR)) AS h
      FROM lineitem
    ),
    parts AS (
      SELECT part_id,
             md5(string_agg(h, '' ORDER BY h)) AS part_digest,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM rows_h GROUP BY part_id
    ),
    root AS (
      SELECT md5(string_agg(part_digest, '' ORDER BY part_id)) AS root_digest
      FROM parts
    )
    SELECT p.part_id, p.part_digest, p.n_rows, r.root_digest
    FROM parts p, root r
    ORDER BY p.part_id
    """,
    tags=("checksum", "merkle", "A6-scale", "replication"),
)
def checksum_merkle_partitions(spark, sf_dir):
    """Merkle-style hierarchical table checksum: per-partition digests
    (md5 over the partition's SORTED row hashes — order-insensitive to
    physical layout) rolled into one root digest over partition order.
    Two replicas compare roots in O(1); on mismatch they walk DOWN the
    partition digests and re-sync only the differing partitions — the
    O(changed-partitions) replica-validation protocol, vs re-hashing
    the table that checksum_* single digests require.  Each partition
    digest is computed from that partition's rows only (partition-
    local sort of ~4k hashes), so the scan parallelizes per partition
    and the root is a tiny final fold.  String md5 concatenation is
    engine-identical under the explicit ORDER BY."""
    rows_h = table(spark, sf_dir, "lineitem").select(
        F.expr("l_orderkey div 4096").alias("part_id"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.floor(F.col("l_extendedprice") * 100 + 0.5)
                .cast("bigint")
                .cast("string"),
            )
        ).alias("h"),
    )
    parts = rows_h.groupBy("part_id").agg(
        F.md5(
            F.concat_ws("", F.array_sort(F.collect_list("h")))
        ).alias("part_digest"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    root = parts.agg(
        F.md5(
            F.concat_ws(
                "",
                F.expr(
                    "transform(array_sort(collect_list(struct(part_id, "
                    "part_digest))), s -> s.part_digest)"
                ),
            )
        ).alias("root_digest")
    )
    return (
        parts.crossJoin(F.broadcast(root))
        .select("part_id", "part_digest", "n_rows", "root_digest")
        .orderBy("part_id")
    )


@register(
    "subquery_not_in_null_trap",
    oracle="""
    WITH probe AS (
      -- a nullable key set that CONTAINS a NULL: customers' nation
      -- keys, with one NULL injected deterministically
      SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL
                  ELSE c_nationkey END AS nk
      FROM customer
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       WHERE n_nationkey NOT IN (SELECT nk FROM probe)) AS not_in_count,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n
       WHERE NOT EXISTS (SELECT 1 FROM probe p
                         WHERE p.nk = n.n_nationkey)) AS not_exists_count,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM probe WHERE nk IS NULL)
        AS n_nulls_in_set
    """,
    tags=("subquery", "null-semantics", "three-valued-logic", "P6"),
)
def subquery_not_in_null_trap(spark, sf_dir):
    """The NOT IN null trap, executed rather than footnoted: when the
    subquery set contains a NULL, `x NOT IN (set)` is UNKNOWN for
    every x (x <> NULL is never TRUE), so NOT IN returns ZERO rows
    while NOT EXISTS — the null-safe formulation — returns the real
    anti-join answer.  The emitted row shows not_in_count = 0,
    not_exists_count > 0, and the null count that caused it: the
    single most common correctness bug in hand-written anti-joins,
    pinned as an oracle-checked contract so this engine's three-valued
    logic provably matches ANSI.  Plan-wise, Spark turns the NOT IN
    into a null-aware anti join — the expensive variant — which is
    exactly why production code should write NOT EXISTS."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    probe = c.select(
        F.when(F.col("c_custkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk")
    )
    probe.createOrReplaceTempView("probe_nulls")
    n.createOrReplaceTempView("nation_nn")
    not_in = spark.sql(
        "SELECT COUNT(*) AS c FROM nation_nn "
        "WHERE n_nationkey NOT IN (SELECT nk FROM probe_nulls)"
    )
    not_exists = spark.sql(
        "SELECT COUNT(*) AS c FROM nation_nn n "
        "WHERE NOT EXISTS (SELECT 1 FROM probe_nulls p "
        "WHERE p.nk = n.n_nationkey)"
    )
    nulls = probe.filter(F.col("nk").isNull()).agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        not_in.select(F.col("c").alias("not_in_count"))
        .crossJoin(not_exists.select(F.col("c").alias("not_exists_count")))
        .crossJoin(nulls.select(F.col("c").alias("n_nulls_in_set")))
    )


@register(
    "join_relational_division",
    oracle="""
    WITH wanted AS (
      -- the divisor: every part the BUSIEST order contains
      SELECT l_partkey AS p FROM lineitem
      WHERE l_orderkey = (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        ORDER BY COUNT(*) DESC, l_orderkey LIMIT 1)
    ),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM wanted),
    hits AS (
      SELECT o.o_custkey AS ck,
             CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS matched
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN wanted w ON w.p = l.l_partkey
      GROUP BY o.o_custkey
    )
    SELECT h.ck AS custkey, h.matched, k.k AS divisor_size
    FROM hits h, k
    WHERE h.matched = k.k
    ORDER BY custkey
    """,
    tags=("join", "relational-division", "set-containment", "J3"),
)
def join_relational_division(spark, sf_dir):
    """Relational DIVISION — \"customers who bought EVERY part in the
    divisor set\" (here: all parts of the busiest order), the
    universal-quantifier query SQL has no operator for.  The scalable
    encoding: semi-join the fact against the broadcast divisor,
    count DISTINCT divisor members per candidate, and keep candidates
    whose count equals |divisor| — one fact pass + a candidate-sized
    aggregate, versus the double-NOT-EXISTS textbook form whose
    nested correlation Catalyst turns into two anti-join passes.
    Exact set arithmetic; the divisor derivation is its own
    deterministic subquery."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    busiest = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("l_orderkey"))
        .limit(1)
    )
    wanted = (
        li.join(F.broadcast(busiest), "l_orderkey")
        .select(F.col("l_partkey").alias("p"))
        .distinct()
    )
    k = wanted.agg(F.count(F.lit(1)).alias("k"))
    hits = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(wanted), li.l_partkey == F.col("p"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.countDistinct("l_partkey").alias("matched"))
    )
    return (
        hits.crossJoin(F.broadcast(k))
        .filter(F.col("matched") == F.col("k"))
        .select("custkey", "matched", F.col("k").alias("divisor_size"))
        .orderBy("custkey")
    )

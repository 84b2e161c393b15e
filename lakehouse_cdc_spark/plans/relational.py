"""Relational-core declared queries (SURVEY §2.2–§2.8).

Every projection/filter/join/aggregation/window/sort/set-op/scalar
family the reference executes (plus the families its semantics rely on
— SURVEY §2.3 note) is exercised here as an idiomatic DataFrame
program with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from lakehouse_cdc_spark.operators.checksum import (
    ordered_table_md5,
    table_checksum_stats,
)
from lakehouse_cdc_spark.operators.joins import (
    anti_join,
    broadcast_join,
    equi_join,
    semi_join,
)
from lakehouse_cdc_spark.plans.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
    table,
)

# ---------------------------------------------------------------------------
# Headline aggregation queries (bench set)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    tags=("agg", "A1", "A4", "A5"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped pricing summary: the canonical wide hash
    aggregation.  Filter is pushed to the parquet scan; partial
    (map-side) aggregation means only ~|groups| rows shuffle."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    bench=True,
    tags=("join", "agg", "topk", "J1", "O2"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-shaped: selective filters on both join sides feed a
    3-way equi-join, grouped revenue, global top-10.  Catalyst pushes
    both predicates into the scans; top-k plans as
    TakeOrderedAndProject (no global sort materialization)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        equi_join(c, o, on=c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    bench=True,
    tags=("join", "agg", "broadcast", "J1"),
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H-Q5-shaped 6-table join.  region/nation/supplier are
    broadcast explicitly — at 100 TB the lineitem side never shuffles
    for those dimensions; only the orders⋈lineitem equi-join is a
    genuine shuffle, and AQE handles its skew."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        broadcast_join(n, r, on=n.n_regionkey == r.r_regionkey)
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Join family (SURVEY §2.3 — inner/left/semi/anti/broadcast)
# ---------------------------------------------------------------------------


@register(
    "join_inner_orders_nation",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS order_cnt,
           {sql_dsum('o.o_totalprice', 'total_revenue')}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    bench=True,
    tags=("join", "J1"),
)
def join_inner_orders_nation(spark, sf_dir):
    """Inner equi-join chain fact→dim→dim with aggregation."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        equi_join(o, c, on=o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dsum(F.col("o_totalprice"), "total_revenue"),
        )
    )


@register(
    "join_left_customer_orders",
    oracle=f"""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS order_cnt,
           {sql_dsum('COALESCE(o.o_totalprice, 0)', 'total_spend')}
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def join_left_customer_orders(spark, sf_dir):
    """Left outer join preserving customers with zero orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        equi_join(c, o, on=c.c_custkey == o.o_custkey, how="left")
        .groupBy("c_custkey")
        .agg(
            F.count(F.col("o_orderkey")).alias("order_cnt"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "total_spend"),
        )
    )


@register(
    "join_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("join", "J3"),
)
def join_semi_customers_with_urgent_orders(spark, sf_dir):
    """Left-semi join: distributed replacement for the reference's
    per-key existence probe loop (validation.py:389-410)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return semi_join(c, o, on=c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "J3"),
)
def join_anti_customers_without_orders(spark, sf_dir):
    """Left-anti join: keys present in source but absent from target —
    the validation toolkit's missing-row check as one distributed op."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return anti_join(c, o, on=c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@register(
    "join_broadcast_nation_region",
    oracle="""
    SELECT r.r_name, COUNT(*) AS nation_cnt
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_nation_region(spark, sf_dir):
    """Explicit broadcast join of two dimensions."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        broadcast_join(n, r, on=n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("nation_cnt"))
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4 — A1..A8) + grouping sets family
# ---------------------------------------------------------------------------


@register(
    "agg_counts_distinct",
    oracle="""
    SELECT COUNT(*) AS row_cnt,
           COUNT(DISTINCT l_orderkey) AS distinct_orders,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers
    FROM lineitem
    """,
    tags=("agg", "A1", "A3"),
)
def agg_counts_distinct(spark, sf_dir):
    """count / distinct-count (A1/A3).  At 100 TB swap exact
    countDistinct for approx_count_distinct (HLL) — exposed as
    `agg_approx_distinct` below with a rows-only check."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
    )


@register(
    "agg_group_stats",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS order_cnt,
           {sql_dsum('o_totalprice', 'sum_price')},
           {sql_davg('o_totalprice', 'avg_price')},
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("agg", "A4", "A5"),
)
def agg_group_stats(spark, sf_dir):
    """Group-by with min/max/avg/sum (A4+A5, the partition-balance
    stats of validation.py:780-785 generalized)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        dsum(F.col("o_totalprice"), "sum_price"),
        davg(F.col("o_totalprice"), "avg_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


@register(
    "agg_rollup_orders",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS order_cnt
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_orders(spark, sf_dir):
    """ROLLUP hierarchy totals (free in Spark; SURVEY §2.4 note)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.col("order_cnt"),
        )
    )


@register(
    "agg_cube_part",
    oracle="""
    SELECT COALESCE(p_brand, 'ALL') AS brand,
           COALESCE(p_type, 'ALL') AS ptype,
           COUNT(*) AS part_cnt,
           CAST(MIN(p_size) AS INT) AS min_size,
           CAST(MAX(p_size) AS INT) AS max_size
    FROM part
    GROUP BY CUBE (p_brand, p_type)
    """,
    tags=("agg", "cube"),
)
def agg_cube_part(spark, sf_dir):
    """CUBE over two dimensions."""
    p = table(spark, sf_dir, "part")
    return (
        p.cube("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("part_cnt"),
            F.min("p_size").cast("int").alias("min_size"),
            F.max("p_size").cast("int").alias("max_size"),
        )
        .select(
            F.coalesce(F.col("p_brand"), F.lit("ALL")).alias("brand"),
            F.coalesce(F.col("p_type"), F.lit("ALL")).alias("ptype"),
            "part_cnt",
            "min_size",
            "max_size",
        )
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.5 — W1/W2 + the generalized family)
# ---------------------------------------------------------------------------


@register(
    "window_rank_orders_per_customer",
    bench=True,
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    """,
    tags=("window", "W1"),
)
def window_rank_orders_per_customer(spark, sf_dir):
    """rank() top-3 orders per customer — W1 generalized from
    row_number to rank, with a total order (price desc, key asc)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "rnk",
        )
    )


@register(
    "window_lag_event_gap",
    oracle="""
    SELECT user_id,
           COUNT(*) AS gap_cnt,
           CAST(SUM(gap_s) AS BIGINT) AS total_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM (
      SELECT user_id,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events
    )
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
    tags=("window", "lag"),
)
def window_lag_event_gap(spark, sf_dir):
    """lag() inter-event gap per user (sessionization building block)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    return (
        e.withColumn("gap_s", gap)
        .filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("gap_cnt"),
            F.sum("gap_s").cast("bigint").alias("total_gap_s"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
        )
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 10000.0 AS running_spend
    FROM orders
    WHERE o_custkey < 100
    """,
    tags=("window", "frame"),
)
def window_running_total(spark, sf_dir):
    """Explicit frame spec (rowsBetween) — cumulative spend per
    customer in order-date order."""
    from lakehouse_cdc_spark.plans.registry import fixed_point

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(fixed_point(F.col("o_totalprice"))).over(w).cast("double") / 10000.0
        ).alias("running_spend"),
    )


@register(
    "window_latest_offsets_sql",
    oracle="""
    WITH ranked_offsets AS (
      SELECT user_id AS partition_id,
             event_id AS "offset",
             ts AS commit_time,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT partition_id, "offset",
           strftime(commit_time, '%Y-%m-%d %H:%M:%S.%f') AS commit_time_str
    FROM ranked_offsets WHERE rn = 1
    """,
    tags=("window", "W2", "cdc"),
)
def window_latest_offsets_sql(spark, sf_dir):
    """W2: the exactly-once path's latest-offset-per-partition CTE
    (spark_exactly_once.py:377-389), SQL form — events stand in for
    the kafka_offsets ledger (user_id≈partition, event_id≈offset)."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_w2")
    return spark.sql(
        """
        WITH ranked_offsets AS (
          SELECT user_id AS partition_id,
                 event_id AS offset,
                 ts AS commit_time,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events_w2
        )
        SELECT partition_id, offset,
               date_format(commit_time, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS commit_time_str
        FROM ranked_offsets WHERE rn = 1
        """
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("sort", "O2"),
)
def topk_orders_global(spark, sf_dir):
    """Global top-k (O2): orderBy+limit plans as
    TakeOrderedAndProject — per-partition heaps + driver merge, never
    a full global sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@register(
    "sort_recent_events",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    tags=("sort", "O2", "O3"),
)
def sort_recent_events(spark, sf_dir):
    """The validation toolkit's recent-rows-for-lag scan
    (validation.py:552-553) as top-k."""
    e = table(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "set_intersect_purchasers_errorers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("setop", "J3"),
)
def set_intersect_purchasers_errorers(spark, sf_dir):
    """INTERSECT — the distributed form of validation.py:563's Python
    set.intersection."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id")
    errors = e.filter(F.col("event_type") == "error").select("user_id")
    return purchases.intersect(errors)


@register(
    "set_except_viewers_not_big_buyers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 400
    """,
    tags=("setop",),
)
def set_except_viewers_not_big_buyers(spark, sf_dir):
    """EXCEPT (set difference): viewers who never made a >400 purchase."""
    e = table(spark, sf_dir, "events")
    viewers = e.filter(F.col("event_type") == "view").select("user_id")
    big_buyers = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 400)
    ).select("user_id")
    return viewers.subtract(big_buyers)


@register(
    "set_union_event_sources",
    oracle="""
    SELECT user_id, kind, COUNT(*) AS cnt FROM (
      SELECT user_id, 'click' AS kind FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, 'view' AS kind FROM events WHERE event_type = 'view'
    )
    GROUP BY user_id, kind
    """,
    tags=("setop", "union"),
)
def set_union_event_sources(spark, sf_dir):
    """unionByName — the engine's micro-batch accumulation primitive
    (multiple same-schema batches; SURVEY §2.7)."""
    e = table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id")
        .withColumn("kind", F.lit("click"))
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .select("user_id")
        .withColumn("kind", F.lit("view"))
    )
    return clicks.unionByName(views).groupBy("user_id", "kind").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8 — F1..F13)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_functions",
    oracle="""
    SELECT c_custkey,
           md5(concat_ws('#', CAST(c_custkey AS VARCHAR),
                              COALESCE(c_name, ''),
                              COALESCE(c_mktsegment, ''))) AS row_md5,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS segment_lower,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len
    FROM customer
    """,
    tags=("scalar", "F1", "F2", "F3"),
)
def scalar_string_functions(spark, sf_dir):
    """md5/concat_ws/coalesce/upper/lower/substr/length — the
    validation checksum's scalar kit (validation.py:291-301)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(
            F.concat_ws(
                "#",
                F.col("c_custkey").cast("string"),
                F.coalesce(F.col("c_name"), F.lit("")),
                F.coalesce(F.col("c_mktsegment"), F.lit("")),
            )
        ).alias("row_md5"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


@register(
    "scalar_date_parts",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
           COUNT(*) AS order_cnt
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("scalar", "F9", "F10"),
)
def scalar_date_parts(spark, sf_dir):
    """year()/month() partition derivation done columnar — replaces
    the reference's driver-side strftime partition strings
    (spark_batch.py:232-233); at scale these become hidden partition
    transforms."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS event_cnt,
           CAST(SUM(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "F11"),
)
def scalar_json_extract(spark, sf_dir):
    """JSON field extraction (F11) — the Debezium envelope access
    pattern (spark_batch.py:152-170) done with get_json_object instead
    of driver-side json.loads."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Checksums (SURVEY §2.4 A6/A7 — validation family)
# ---------------------------------------------------------------------------

_NATION_COLS = "CAST(n_nationkey AS VARCHAR) || '#' || COALESCE(n_name,'') || '#' || CAST(n_regionkey AS VARCHAR)"


@register(
    "checksum_ordered_nation",
    oracle=f"""
    SELECT md5(string_agg(combined_cols, ',' ORDER BY combined_cols)) AS table_md5,
           COUNT(*) AS row_cnt
    FROM (SELECT {_NATION_COLS} AS combined_cols FROM nation)
    """,
    tags=("checksum", "A6"),
)
def checksum_ordered_nation(spark, sf_dir):
    """The reference's whole-table ordered MD5 (validation.py:294-302)
    made partitioning-independent (sort inside the aggregate).  Small
    tables only — see checksum_stats_lineitem for the scale path."""
    n = table(spark, sf_dir, "nation")
    sig = F.concat_ws(
        "#",
        F.col("n_nationkey").cast("string"),
        F.coalesce(F.col("n_name"), F.lit("")),
        F.col("n_regionkey").cast("string"),
    )
    return ordered_table_md5(n.select(sig.alias("s")), cols=["s"])


@register(
    "checksum_stats_lineitem",
    bench=True,
    oracle="""
    SELECT COUNT(*) AS row_cnt,
           COUNT(DISTINCT (CAST('0x' || substr(sig, 1, 15) AS BIGINT),
                           CAST('0x' || substr(sig, 17, 15) AS BIGINT))) AS distinct_sigs,
           MIN(sig) AS min_sig,
           MAX(sig) AS max_sig,
           bit_xor(CAST('0x' || substr(sig, 1, 15) AS BIGINT)) AS xor_sig
    FROM (
      SELECT md5(concat_ws('#',
               CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
               CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
               COALESCE(l_returnflag,''), COALESCE(l_linestatus,''))) AS sig
      FROM lineitem
    )
    """,
    tags=("checksum", "A6-scale"),
)
def checksum_stats_lineitem(spark, sf_dir):
    """Order-insensitive checksum at scale: per-row MD5 stays map-side;
    only 4 scalars cross the wire."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("a"),
        F.col("l_linenumber").cast("string").alias("b"),
        F.col("l_partkey").cast("string").alias("c"),
        F.col("l_suppkey").cast("string").alias("d"),
        F.coalesce(F.col("l_returnflag"), F.lit("")).alias("e"),
        F.coalesce(F.col("l_linestatus"), F.lit("")).alias("f"),
    )
    return table_checksum_stats(li)


# ---------------------------------------------------------------------------
# Scale-path extras (rows-only checks: no exact oracle by design)
# ---------------------------------------------------------------------------


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_within_5pct,
           TRUE AS parts_within_5pct
    FROM lineitem
    """,
    tags=("agg", "A3-scale"),
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL++): the 100 TB replacement for exact
    distinct counts (single pass, fixed memory, no shuffle of keys).
    The accuracy contract is ON the oracle surface: the query emits
    the exact counts plus a within-5%-tolerance flag comparing the
    sketch against them, and the DuckDB oracle emits (exact, TRUE) —
    a hash match PROVES the sketch met its bound on this dataset.
    At 100 TB only the sketch arm runs; the exact arm exists here to
    make the bound verifiable."""
    li = table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (
        F.abs(F.col(approx) - F.col(exact))
        <= F.lit(0.05) * F.col(exact)
    ).alias(approx.replace("approx_", "") + "_within_5pct")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).select(
        "exact_orders",
        "exact_parts",
        within("approx_orders", "exact_orders"),
        within("approx_parts", "exact_parts"),
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS qualifying_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "P4", "P5"),
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H-Q6-shaped: the pure scan-filter-aggregate benchmark —
    every predicate must reach the parquet scan (PushedFilters) and
    the whole query is one codegen stage + one scalar exchange."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("qualifying_rows"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    bench=True,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H-Q10-shaped: top lossy customers by returned-item revenue
    — selective fact filters, 4-way join, grouped top-20."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "agg_approx_percentile_dual",
    oracle="""
    SELECT
      CAST(floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) AS BIGINT)
        AS p50_exact_cents,
      CAST(floor(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) AS BIGINT)
        AS p90_exact_cents,
      CAST(floor(quantile_cont(l_extendedprice, 0.99) * 100 + 0.5) AS BIGINT)
        AS p99_exact_cents,
      TRUE AS p50_within_1pct,
      TRUE AS p90_within_1pct,
      TRUE AS p99_within_1pct
    FROM lineitem
    """,
    tags=("agg", "approx", "percentile", "A5-scale"),
)
def agg_approx_percentile_dual(spark, sf_dir):
    """approx_percentile (GK sketch: one pass, bounded memory,
    MERGEABLE partials — the 100 TB path) side by side with the exact
    interpolated percentile, plus the absolute error — the same
    dual-reporting contract as agg_approx_distinct vs the exact count.
    The exact arm needs a full sort-and-index per group; the sketch
    arm shuffles O(1/accuracy) tuples per partition regardless of row
    count.  The accuracy contract (rel. error < 1% at accuracy 10000)
    is ON the oracle surface: the query emits the exact interpolated
    percentiles (fixed-point cents) plus within-1% flags comparing the
    sketch against them; the DuckDB oracle emits (exact, TRUE), so a
    hash match PROVES the bound on this dataset."""
    li = table(spark, sf_dir, "lineitem")
    out = li.agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("approx"),
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
        ).alias("exact"),
    )

    def cents(i, name):
        return (
            F.floor(F.element_at("exact", i) * 100 + F.lit(0.5))
            .cast("bigint")
            .alias(name)
        )

    def flag(i, name):
        a, e = F.element_at("approx", i), F.element_at("exact", i)
        return (F.abs(a - e) <= F.lit(0.01) * F.abs(e)).alias(name)

    return out.select(
        cents(1, "p50_exact_cents"),
        cents(2, "p90_exact_cents"),
        cents(3, "p99_exact_cents"),
        flag(1, "p50_within_1pct"),
        flag(2, "p90_within_1pct"),
        flag(3, "p99_within_1pct"),
    )
